"""Is XLA:TPU slow on 5-D convs with unit dims? (SlowFast = 8 TFLOP/s.)

The motion branch costs 17.7 ms of the 352 ms fused-perspective batch at
~8 TFLOP/s effective — 4% MFU. Every conv in SlowFast except the fast
stem has a unit dim: (1,3,3) spatial or (t,1,1) temporal. Hypothesis:
XLA's 3-D conv path doesn't tile these onto the MXU as well as the
equivalent 2-D conv after folding the unit axis into batch/space.

Sections (chained-slope, bs=4 at the 448px serving shapes):
  s133: (1,3,3) conv — NDHWC conv3d vs fold-T-into-batch conv2d
  t311: (3,1,1) conv — NDHWC conv3d vs fold-HW conv2d
  model: full SlowFastR50 apply (current wiring)

Usage: python benchmarks/motion_conv_probe.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def time_chained(fn, args, iters=16):
    x0, rest = args[0], args[1:]

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, *rest, n):
        def body(i, x):
            out = fn(x, *rest)
            s = jnp.max(out.astype(jnp.float32))
            return (x + s.astype(x.dtype) * 1e-9).astype(x.dtype)

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(fn(x, *rest).astype(jnp.float32))

    for n in (iters, 4 * iters):
        assert np.isfinite(float(run(x0, *rest, n=n)))
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0, *rest, n=iters))
        t1 = time.perf_counter()
        float(run(x0, *rest, n=4 * iters))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (3 * iters))
    return max(float(np.median(slopes)), 1e-9)


def main():
    rng = np.random.default_rng(0)
    report = {}

    # ---- (1,3,3) spatial conv, fast-path res3 shape at 448px serving ----
    # [B=4, T=8, 112, 112, 128] -> 128, the expensive middle of the net
    for tag, (b, t, hw, cin, cout) in {
        "s133_fast112": (4, 8, 112, 128, 128),
        "s133_slow112": (4, 2, 112, 256, 256),
        "s133_fast56": (4, 8, 56, 256, 256),
    }.items():
        x = jnp.asarray(rng.normal(size=(b, t, hw, hw, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(1, 3, 3, cin, cout)) * 0.05, jnp.bfloat16)
        flops = 2 * b * t * hw * hw * cin * cout * 9

        def conv3d(x, k=k):
            return lax.conv_general_dilated(
                x, k, (1, 1, 1), [(0, 0), (1, 1), (1, 1)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        def conv2d_fold(x, k=k, b=b, t=t, hw=hw, cin=cin, cout=cout):
            y = lax.conv_general_dilated(
                x.reshape(b * t, hw, hw, cin), k.reshape(3, 3, cin, cout),
                (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y.reshape(b, t, hw, hw, cout)

        for name, fn in (("conv3d", conv3d), ("fold2d", conv2d_fold)):
            dt = time_chained(fn, (x,))
            report[f"{tag}_{name}_ms"] = round(dt * 1e3, 3)
            report[f"{tag}_{name}_tfs"] = round(flops / dt / 1e12, 1)
            print(tag, name, report[f"{tag}_{name}_ms"], "ms",
                  report[f"{tag}_{name}_tfs"], "TF/s", flush=True)

    # ---- (3,1,1) temporal conv, slow res4 shape ----
    for tag, (b, t, hw, cin, cout) in {
        "t311_slow28": (4, 2, 28, 1024, 256),
        "t311_fast28": (4, 8, 28, 128, 32),
    }.items():
        x = jnp.asarray(rng.normal(size=(b, t, hw, hw, cin)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(3, 1, 1, cin, cout)) * 0.05, jnp.bfloat16)
        flops = 2 * b * t * hw * hw * cin * cout * 3

        def conv3d(x, k=k):
            return lax.conv_general_dilated(
                x, k, (1, 1, 1), [(1, 1), (0, 0), (0, 0)],
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        def conv2d_fold(x, k=k, b=b, t=t, hw=hw, cin=cin, cout=cout):
            y = lax.conv_general_dilated(
                x.reshape(b, t, hw * hw, cin), k.reshape(3, 1, cin, cout),
                (1, 1), [(1, 1), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y.reshape(b, t, hw, hw, cout)

        for name, fn in (("conv3d", conv3d), ("fold2d", conv2d_fold)):
            dt = time_chained(fn, (x,))
            report[f"{tag}_{name}_ms"] = round(dt * 1e3, 3)
            report[f"{tag}_{name}_tfs"] = round(flops / dt / 1e12, 1)
            print(tag, name, report[f"{tag}_{name}_ms"], "ms",
                  report[f"{tag}_{name}_tfs"], "TF/s", flush=True)

    # ---- full model, current wiring ----
    from aigv_assessor_tpu.models.motion import SlowFastR50
    from aigv_assessor_tpu.core.precision import Precision

    model = SlowFastR50(precision=Precision())
    px = jnp.asarray(rng.normal(size=(4, 8, 448, 448, 3)), jnp.bfloat16)
    params = jax.jit(model.init)(jax.random.key(0), px)

    def full(px, params=params):
        return model.apply(params, px)

    dt = time_chained(full, (px,), iters=4)
    report["slowfast_ms"] = round(dt * 1e3, 2)
    print("slowfast", report["slowfast_ms"], "ms", flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

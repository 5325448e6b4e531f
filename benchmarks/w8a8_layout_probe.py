"""Does reshaping to 2-D before the int8 dot restore the native rate?

w8a8_model_probe found: 2-D int8 dot = 330-375 TOPS (native), but the
3-D [B, S, C] x [C, N] form = 197 TOPS (bf16-equivalent: XLA falls off the
int8 MXU path), head-major 4-D einsum = 270, head-major-in = 156 (slower
than bf16). This probes explicit reshape-to-2D variants of each.

Usage: python benchmarks/w8a8_layout_probe.py
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

from aigv_assessor_tpu.ops.w8a8 import quantize_rows


def time_chained(fn, args, iters=8):
    x0, rest = args[0], args[1:]

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, *rest, n):
        def body(i, x):
            out = fn(x, *rest)
            s = jnp.max(out)
            return x.at[:1].set(
                jnp.broadcast_to(s.astype(x.dtype), x.shape[1:])[None]
            )

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(fn(x, *rest).astype(jnp.float32))

    for n in (iters, 4 * iters):
        s = float(run(x0, *rest, n=n))
        assert np.isfinite(s), s
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
    b, s, c, n = 64, 1032, 1024, 4096
    x = jnp.asarray(rng.normal(size=(b, s, c)), jnp.bfloat16)
    wq = jnp.asarray(rng.integers(-127, 128, (c, n)), jnp.int8)
    sw = jnp.asarray((rng.random(n) + 0.5) * 2e-4, jnp.float32)
    flops = 2 * b * s * c * n
    report = {}

    def dense3d(x, w, sc):
        xq, sx = quantize_rows(x)
        acc = jax.lax.dot_general(
            xq, w, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * sx * sc).astype(jnp.bfloat16)

    def dense2d(x, w, sc):
        xq, sx = quantize_rows(x)
        xq2 = xq.reshape(-1, xq.shape[-1])
        acc = jax.lax.dot_general(
            xq2, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * sx.reshape(-1, 1) * sc
        return y.astype(jnp.bfloat16).reshape(x.shape[:-1] + (w.shape[-1],))

    def dense2d_i8out(x, w, sc):
        # epilogue variant: scale applied AFTER reshaping back (same math)
        xq, sx = quantize_rows(x)
        acc = jax.lax.dot_general(
            xq.reshape(-1, c), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).reshape(b, s, n)
        return (acc.astype(jnp.float32) * sx * sc).astype(jnp.bfloat16)

    for name, fn in (
        ("dense3d", dense3d),
        ("dense2d", dense2d),
        ("dense2d_scale_after_reshape", dense2d_i8out),
    ):
        t = time_chained(fn, (x, wq, sw), 8)
        report[name + "_ms"] = round(t * 1e3, 3)
        report[name + "_tops"] = round(flops / t / 1e12, 1)
        print(name, report[name + "_ms"], "ms", report[name + "_tops"],
              "TOPS", flush=True)

    # head-major via 2-D dot + transpose: is dot(native) + relayout copy
    # faster than the 4-D einsum at 270 TOPS?
    heads, d = 48, 64
    wq2 = jnp.asarray(rng.integers(-127, 128, (c, heads * d)), jnp.int8)
    sw2 = jnp.asarray((rng.random(heads * d) + 0.5) * 2e-4, jnp.float32)
    hm_flops = 2 * b * s * c * heads * d

    def hm_2d(x, w, sc):
        xq, sx = quantize_rows(x)
        acc = jax.lax.dot_general(
            xq.reshape(-1, c), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * sx.reshape(-1, 1) * sc
        return (
            y.astype(jnp.bfloat16)
            .reshape(b, s, heads, d)
            .transpose(0, 2, 1, 3)
        )

    t = time_chained(hm_2d, (x, wq2, sw2), 8)
    report["headmajor_2d_ms"] = round(t * 1e3, 3)
    report["headmajor_2d_tops"] = round(hm_flops / t / 1e12, 1)
    print("headmajor_2d", report["headmajor_2d_ms"], "ms",
          report["headmajor_2d_tops"], "TOPS", flush=True)

    # head-major-in via 2-D: transpose+reshape the input, then 2-D dot
    hh = 16
    xh = jnp.asarray(rng.normal(size=(b, hh, s, 64)), jnp.bfloat16)
    wo = jnp.asarray(rng.integers(-127, 128, (hh * 64, c)), jnp.int8)
    so = jnp.asarray((rng.random(c) + 0.5) * 2e-4, jnp.float32)
    hmi_flops = 2 * b * s * hh * 64 * c

    def hmi_2d(xh, w, sc):
        xt = xh.transpose(0, 2, 1, 3).reshape(b * s, hh * 64)
        xq, sx = quantize_rows(xt)
        acc = jax.lax.dot_general(
            xq, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * sx * sc
        return y.astype(jnp.bfloat16).reshape(b, s, c)

    t = time_chained(hmi_2d, (xh, wo, so), 8)
    report["headmajor_in_2d_ms"] = round(t * 1e3, 3)
    report["headmajor_in_2d_tops"] = round(hmi_flops / t / 1e12, 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

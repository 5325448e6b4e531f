"""Does plain-XLA int8 x int8 -> int32 `lax.dot_general` lower to the
native int8 MXU path on this chip?

Round-3 refuted W8A8 *inside Pallas* (Mosaic emulated the int8 matmul at
29 GB/s), but that says nothing about XLA's own lowering. v5e has ~2x
bf16 MXU throughput for int8 (394 vs 197 TFLOP/s peak); if XLA lowers it
natively, the bf16 ~13 videos/s single-chip speed-of-light for the
scoring pipeline roughly doubles and W8A8 scoring becomes the last perf
lever (VERDICT round 3, item 1).

Times the compute-bound prefill shapes of the 2B InternLM2
(`cli/common.py:LLM_2B`, M = bs*seq = 4*2113) and the ViT MLP
(M = 64 frames * 1032 padded tokens) in bf16 vs int8->int32 vs an
int8->int32-with-bf16-scale-epilogue variant (what a real W8A8 layer
must run), using the chained-slope protocol from int4_bench.

Usage: python benchmarks/int8_xla_probe.py [--iters 8]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_chained(fn, args, iters):
    """Slope between fori_loop lengths n and 4n (see int4_bench)."""
    x0, ws = args[0], args[1:]

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, *ws, n):
        def body(i, x):
            out = fn(x, *ws)
            # consume EVERY element (max-reduce) before folding back into x:
            # feeding only out[:1,:1] lets XLA slice the in-loop matmul down
            # to a single dot product (the round-2 DCE trap — bf16 slopes
            # measured 0.0 that way). max keeps values finite across iters.
            s = jnp.max(out)
            return x.at[:1, :1].set(s.astype(x.dtype)[None, None])

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(fn(x, *ws).astype(jnp.float32))

    n1, n2 = iters, 4 * iters
    for n in (n1, n2):
        s = float(run(x0, *ws, n=n))
        assert np.isfinite(s), s
    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0, *ws, n=n1))
        t1 = time.perf_counter()
        float(run(x0, *ws, n=n2))
        t2 = time.perf_counter()
        slopes.append(((t2 - t1) - (t1 - t0)) / (n2 - n1))
    return max(float(np.median(slopes)), 1e-9)


def bf16_mm(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.bfloat16
    )


def int8_mm(x, w):
    return jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )


def int8_mm_scaled(x, w, sx, sw):
    """The epilogue a real W8A8 layer pays: int32 acc -> fp32 -> scale."""
    acc = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (acc.astype(jnp.float32) * sx * sw).astype(jnp.bfloat16)


def main():
    ap = argparse.ArgumentParser()
    # iters=8 was too small for the bf16 control: ~0.7 ms/iter signal x 24
    # extra iters = 17 ms, inside the tunnel's per-call noise — slopes came
    # out ~0 while the int8 ones (bigger per-iter) were clean. 32 gives
    # 96-iter deltas (>=70 ms of signal per shape).
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument(
        "--with_unscaled",
        action="store_true",
        help="also time raw int8->int32 (2 extra compiles per shape)",
    )
    ap.add_argument("--shapes", type=str, default="", help="comma filter")
    args = ap.parse_args()

    # (name, M, K, N): LLM prefill at bs=4 seq 2113 (padded to 8448 rows),
    # ViT MLP at 64 frames x 1032 padded tokens.
    shapes = [
        ("llm_wqkv", 8448, 2048, 4096),
        ("llm_w13", 8448, 2048, 16384),
        ("llm_w2", 8448, 8192, 2048),
        ("vit_fc1", 66048, 1024, 4096),
        ("vit_fc2", 66048, 4096, 1024),
    ]
    if args.shapes:
        keep = set(args.shapes.split(","))
        shapes = [s for s in shapes if s[0] in keep]
    rng = np.random.default_rng(0)
    report = {"device": str(jax.devices()[0])}
    for name, m, k, n in shapes:
        xb = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(size=(k, n)) * 0.02, jnp.bfloat16)
        x8 = jnp.asarray(rng.integers(-127, 128, size=(m, k)), jnp.int8)
        w8 = jnp.asarray(rng.integers(-127, 128, size=(k, n)), jnp.int8)
        sx = jnp.asarray(rng.random((m, 1)) + 0.5, jnp.float32)
        sw = jnp.asarray(rng.random((1, n)) + 0.5, jnp.float32)

        flops = 2 * m * k * n
        t_bf = time_chained(bf16_mm, (xb, wb), args.iters)
        t_i8s = time_chained(int8_mm_scaled, (x8, w8, sx, sw), args.iters)
        report[name] = {
            "bf16_ms": round(t_bf * 1e3, 3),
            "int8_scaled_ms": round(t_i8s * 1e3, 3),
            "bf16_tflops": round(flops / t_bf / 1e12, 1),
            "int8_scaled_tops": round(flops / t_i8s / 1e12, 1),
            "speedup_scaled_vs_bf16": round(t_bf / t_i8s, 2),
        }
        if args.with_unscaled:
            t_i8 = time_chained(int8_mm, (x8, w8), args.iters)
            report[name]["int8_ms"] = round(t_i8 * 1e3, 3)
            report[name]["int8_tops"] = round(flops / t_i8 / 1e12, 1)
        print(name, json.dumps(report[name]), flush=True)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

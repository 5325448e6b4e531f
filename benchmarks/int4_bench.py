"""W4A16 decode matmul microbench: can in-kernel nibble unpack beat the
bf16 HBM bandwidth ceiling?

Decode at 2B bs=1 is weight-streaming-bound: 3.78 GB of bf16 weights /
819 GB/s = 217 tok/s ceiling (BENCH_NOTES.md). int4 streams a quarter of
the bytes; the question is whether the VPU unpack (2 shifts + 2 casts per
byte) eats the saving — the analogous W8A16 measurement was a wash
(154 vs 161 tok/s). This bench times the three decode-critical matvec
shapes of the 2B InternLM2 (wqkv, w1|w3, w2; `cli/common.py:LLM_2B`) and
the LM head in bf16 / int8(W8A16) / int4(W4A16) and prints implied
per-layer timings + projected tokens/sec.

Usage: python benchmarks/int4_bench.py [--m 1] [--iters 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def time_chained(fn, args, iters):
    """Differential device-side chained timing: two fori_loop lengths
    (iters and 4*iters) with a data dependence, per-iter = slope between
    them — cancels the fixed per-call tunnel/dispatch overhead (measured
    ~28 ms/call this session, dwarfing sub-ms kernels; BENCH_NOTES.md
    traps). Median of 3 slope estimates."""
    x0, ws = args[0], args[1:]
    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, *ws, n):
        def body(i, x):
            out = fn(x, *ws)
            return x.at[:, :1].set(out[:, :1].astype(x.dtype))

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(fn(x, *ws).astype(jnp.float32))

    n1, n2 = iters, 4 * iters
    for n in (n1, n2):  # compile + warm both
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1, help="batch rows (decode bs)")
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    from aigv_assessor_tpu.ops.int8_matmul import (
        int4_matmul,
        int8_matmul,
        quantize_weight,
    )
    from aigv_assessor_tpu.tools.convert_to_int8 import quantize_kernel_int4

    # 2B decode shapes: per-layer wqkv 2048->(16+2*8)*128=4096... see
    # LLM_2B: hq=16, hkv=8, d=128 -> (16+16)*128 = 4096; w1|w3 2048->16384;
    # w2 8192->2048; LM head 2048->92553 (once)
    shapes = {
        "wqkv": (2048, 4096),
        "w13": (2048, 16384),
        "w2": (8192, 2048),
        "wo": (2048, 2048),
        "lm_head": (2048, 92544),
    }
    m = args.m
    rng = np.random.default_rng(0)
    report = {"m": m}
    per_layer = {"bf16": 0.0, "int8": 0.0, "int4": 0.0}
    for name, (k, n) in shapes.items():
        w = (rng.normal(size=(k, n)) * 0.02).astype(np.float32)
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        wb = jnp.asarray(w, jnp.bfloat16)
        w8, s8 = quantize_weight(jnp.asarray(w))
        p4, s4 = quantize_kernel_int4(w)
        p4 = jnp.asarray(p4)
        s4 = jnp.asarray(s4)

        t_bf16 = time_chained(
            jax.jit(lambda a, b: a @ b), (x, wb), args.iters
        )
        t_int8 = time_chained(
            jax.jit(lambda a, b, c: int8_matmul(a, b, c)), (x, w8, s8),
            args.iters,
        )
        t_int4 = time_chained(
            jax.jit(lambda a, b, c: int4_matmul(a, b, c)), (x, p4, s4),
            args.iters,
        )
        gb = k * n * 2 / 1e9
        report[name] = {
            "bf16_us": round(t_bf16 * 1e6, 1),
            "int8_us": round(t_int8 * 1e6, 1),
            "int4_us": round(t_int4 * 1e6, 1),
            "bf16_gbps": round(gb / t_bf16, 1),
            "int8_gbps_eq": round(gb / t_int8, 1),
            "int4_gbps_eq": round(gb / t_int4, 1),
        }
        if name != "lm_head":
            for kdt, t in (("bf16", t_bf16), ("int8", t_int8), ("int4", t_int4)):
                per_layer[kdt] += t

    # projected decode: 24 layers * dense time + lm_head + measured
    # non-dense overhead (attention+cache ~0.55 ms + norms/rope etc.)
    overhead_s = 1.0e-3
    for kdt in ("bf16", "int8", "int4"):
        total = 24 * per_layer[kdt] + report["lm_head"][f"{kdt}_us"] / 1e6 + overhead_s
        report[f"projected_tok_s_{kdt}"] = round(1.0 / total, 1)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()

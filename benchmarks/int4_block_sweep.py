"""int4_matmul block-size sweep at the decode shape.

The W4A16 kernel runs at ~29% of its 4-bit DMA ceiling (BENCH_NOTES.md
round 3) — the VPU nibble-unpack floor is ~3 lane-ops/nibble, but loop
structure (block_k2 granularity, n-block size, dot width) decides how much
of the unpack overlaps the MXU dots and the next block's DMA. Sweeps
(block_n, block_k) on the two dominant per-layer shapes at m=1 with the
slope-timing protocol.

Usage: python benchmarks/int4_block_sweep.py [--m 1] [--iters 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.int4_bench import time_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=1)
    ap.add_argument("--iters", type=int, default=64)
    args = ap.parse_args()

    from aigv_assessor_tpu.ops.int8_matmul import int4_matmul
    from aigv_assessor_tpu.tools.convert_to_int8 import quantize_kernel_int4

    shapes = {"w13": (2048, 16384), "w2": (8192, 2048)}
    rng = np.random.default_rng(0)
    for name, (k, n) in shapes.items():
        w = (rng.normal(size=(k, n)) * 0.02).astype(np.float32)
        x = jnp.asarray(rng.normal(size=(args.m, k)), jnp.bfloat16)
        p4, s4 = quantize_kernel_int4(w)
        p4, s4 = jnp.asarray(p4), jnp.asarray(s4)
        gb = k * n * 2 / 1e9  # bf16-equivalent bytes
        for bn in (512, 1024, 2048):
            for bk in (512, 1024, 2048):
                if bk > k:
                    continue
                try:
                    fn = jax.jit(
                        lambda a, b, c, bn=bn, bk=bk: int4_matmul(
                            a, b, c, block_n=bn, block_k=bk
                        )
                    )
                    t = time_chained(fn, (x, p4, s4), args.iters)
                    print(
                        json.dumps(
                            {
                                "shape": name,
                                "block_n": bn,
                                "block_k": bk,
                                "us": round(t * 1e6, 1),
                                "gbps_bf16_eq": round(gb / t, 1),
                            }
                        ),
                        flush=True,
                    )
                except Exception as e:  # noqa: BLE001 — continue sweep
                    print(
                        json.dumps(
                            {"shape": name, "block_n": bn, "block_k": bk,
                             "error": repr(e)[:120]}
                        ),
                        flush=True,
                    )


if __name__ == "__main__":
    main()

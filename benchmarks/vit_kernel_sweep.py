"""ViT flash-kernel variant sweep on the production shape.

Times the fused-qkv inference kernel (the exact call the ViT encoder makes:
[B=64, Ht=48, S=1032, D=64], kv_valid=1025) across tiling / precision
variants, with the chained-loop + scalar-readback protocol (BENCH_NOTES.md
traps). Variants:
  - block_q/block_k: full single tile (1032) vs 344-row sub-tiles
    (1032 = 3 * 344; deeper grid pipelining vs bigger matmuls)
  - pf16: probability tile stored bf16 on the inference path (halves the
    post-exp2 score-tile VMEM traffic)

Usage: python benchmarks/vit_kernel_sweep.py [--iters 30]
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

from aigv_assessor_tpu.ops import pallas_attention as pa

B, S, H, D = 64, 1032, 16, 64
KV_VALID = 1025
HT = 3 * H  # fused [q | k | v]


def time_variant(name, qkv0, block_q, block_k, pf16, iters):
    pa.PF16_INFERENCE = pf16
    scale = D**-0.5

    @jax.jit
    def chained(qkv):
        def body(i, qkv):
            out = pa._flash_qkv(
                qkv, H, H, False, scale, block_q, block_k, KV_VALID
            )
            # data dependence: feed the output back into the q heads
            return qkv.at[:, :H].set(out.astype(qkv.dtype))

        qkv = jax.lax.fori_loop(0, iters, body, qkv)
        return jnp.sum(qkv.astype(jnp.float32))

    r = float(chained(qkv0))  # compile + warm
    assert np.isfinite(r), (name, r)

    @jax.jit
    def nop(x):
        return jnp.sum(x[0, 0, 0].astype(jnp.float32))

    float(nop(qkv0))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(qkv0))
        t1 = time.perf_counter()
        float(nop(qkv0))
        t2 = time.perf_counter()
        times.append(((t1 - t0) - (t2 - t1)) / iters)
    ms = float(np.median(times)) * 1e3
    flops = 4 * B * H * S * S * D
    print(
        json.dumps(
            {
                "variant": name,
                "block_q": block_q,
                "block_k": block_k,
                "pf16": pf16,
                "ms": round(ms, 3),
                "tflops_eff": round(flops / (ms * 1e-3) / 1e12, 1),
            }
        ),
        flush=True,
    )
    pa.PF16_INFERENCE = False
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    qkv = jnp.asarray(rng.normal(size=(B, HT, S, D)) * 0.3, jnp.bfloat16)

    variants = [
        ("full", S, S, False),
        ("full_pf16", S, S, True),
        ("bq344", 344, S, False),
        ("bq344_pf16", 344, S, True),
        ("bk344", S, 344, False),
        ("bq344_bk344", 344, 344, False),
    ]
    for name, bq, bk, pf16 in variants:
        try:
            time_variant(name, qkv, bq, bk, pf16, args.iters)
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)


if __name__ == "__main__":
    main()

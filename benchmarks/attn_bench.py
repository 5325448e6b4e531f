"""Attention-core microbenchmark (chained in-program iterations).

Measures the Pallas flash-attention forward (and optionally fwd+bwd) on the
two hot shapes:
  - ViT:  bs=64, S=1025, Hq=Hkv=16, D=64, non-causal
  - LLM:  bs=4,  S=2113, Hq=16, Hkv=8, D=128, causal
Per-call tunnel overhead (~400us) is amortized by chaining iterations inside
one jitted program via a data dependence (out feeds the next q), ending in a
scalar readback (the tunneled chip's block_until_ready does not fence —
see bench.py docstring).

Usage: python benchmarks/attn_bench.py [--shape vit|llm|both] [--bwd]
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

from aigv_assessor_tpu.ops.pallas_attention import flash_attention


def bench_shape(name, b, s, hq, hkv, d, causal, iters=50, bwd=False):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, s, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.bfloat16)

    if bwd:
        def loss(q, k, v):
            return jnp.sum(
                flash_attention(q, k, v, causal=causal).astype(jnp.float32)
            )

        grad_fn = jax.grad(loss, argnums=(0, 1, 2))

        @jax.jit
        def chained(q, k, v):
            def body(i, carry):
                q, acc = carry
                dq, dk, dv = grad_fn(q, k, v)
                probe = (
                    jnp.sum(dq.astype(jnp.float32))
                    + jnp.sum(dk.astype(jnp.float32))
                    + jnp.sum(dv.astype(jnp.float32))
                )
                # data-dep chain: perturb q by a tiny function of the grads
                return q + (dq * 0.0), acc + probe

            _, acc = jax.lax.fori_loop(0, iters, body, (q, jnp.float32(0)))
            return acc
    else:

        @jax.jit
        def chained(q, k, v):
            def body(i, q):
                out = flash_attention(q, k, v, causal=causal)
                return out.astype(q.dtype)

            out = jax.lax.fori_loop(0, iters, body, q)
            return jnp.sum(out.astype(jnp.float32))

    r = float(chained(q, k, v))  # compile + sync
    assert np.isfinite(r), r
    t0 = time.perf_counter()
    r = float(chained(q, k, v))
    dt = time.perf_counter() - t0

    # subtract readback rtt via a trivial program
    @jax.jit
    def nop(q):
        return jnp.sum(q[0, 0, 0].astype(jnp.float32))

    float(nop(q))
    t0 = time.perf_counter()
    float(nop(q))
    rtt = time.perf_counter() - t0

    per_iter = (dt - rtt) / iters
    mult = 3.5 if bwd else 1.0  # bwd ~ 2.5x fwd flops (dq+dkv recompute)
    flops = 4 * b * hq * s * s * d * (0.5 if causal else 1.0) * mult
    tflops = flops / per_iter / 1e12
    print(
        json.dumps(
            {
                "shape": name,
                "mode": "fwd+bwd" if bwd else "fwd",
                "ms": round(per_iter * 1000, 3),
                "tflops_eff": round(tflops, 1),
            }
        ),
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="both", choices=["vit", "llm", "both"])
    ap.add_argument("--bwd", action="store_true")
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    if args.shape in ("vit", "both"):
        bench_shape("vit", 64, 1025, 16, 16, 64, False, args.iters, args.bwd)
    if args.shape in ("llm", "both"):
        bench_shape("llm", 4, 2113, 16, 8, 128, True, args.iters, args.bwd)


if __name__ == "__main__":
    main()

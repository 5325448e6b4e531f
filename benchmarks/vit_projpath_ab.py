"""A/B the ViT attention->proj sub-block layouts under W8A8 (round 5).

The round-5 component profile showed the dense-out kernel + int8 proj made
the ViT SLOWER (169.5 vs 163.6 ms round-4 encode) while the same change on
the LLM wo was a win (-7 ms). Hypothesis: at ViT head geometry (hp=2 heads
per program, D=64) the in-kernel lane-concatenate of the two heads' 64-wide
outputs into one 128-wide store is a Mosaic lane shuffle the LLM (hp=1,
D=128) never pays. Variants, at the headline profile shape
([B=32, S=1032(kv 1025), H=16, D=64] == bs=4 x 8 frames):

  a  bhsd kernel + bf16 head-major-in proj einsum   (round-4 W8A8 config)
  b  dense-out kernel + int8 dense proj             (round-5 current)
  c  bhsd kernel + XLA relayout + int8 dense proj   (pay an explicit copy,
     keep the fast kernel AND the 264-TOPS dense int8 matmul)
  d  dense-out kernel + bf16 dense proj             (isolate kernel cost)

Chained-loop + scalar-readback protocol (BENCH_NOTES.md traps).

Usage: python benchmarks/vit_projpath_ab.py [--iters 20]
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
from aigv_assessor_tpu.ops.w8a8 import w8a8_matmul

B, S, H, D = 32, 1032, 16, 64
KV_VALID = 1025
HT = 3 * H
C = H * D


def make_variant(kind, w_bf16, w_int8, w_scale):
    scale = D**-0.5

    def attn_bhsd(qkv):
        return pa._flash_qkv(qkv, H, H, False, scale, 344, 344, KV_VALID)

    def attn_dense(qkv):
        return pa.flash_attention_qkv(
            qkv, H, H, causal=False, block_q=344, block_k=344,
            kv_valid=KV_VALID, out_layout="bsd",
        )

    def proj_back(qkv, y):  # [B, S', C] -> feed back into the q heads
        # constant re-layout cost shared by every variant (data dependence)
        q = y.reshape(B, -1, H, D).transpose(0, 2, 1, 3)
        s_eff = q.shape[2]
        return qkv.at[:, :H, :s_eff].set(q.astype(qkv.dtype))

    if kind == "a":  # bhsd + bf16 head-major-in einsum
        def step(qkv):
            out = attn_bhsd(qkv)  # [B, H, S, D]
            y = jnp.einsum(
                "bhsd,hdc->bsc", out,
                w_bf16.reshape(H, D, C).astype(jnp.bfloat16),
            )
            return proj_back(qkv, y)
    elif kind == "b":  # dense-out kernel + int8 dense proj
        def step(qkv):
            out = attn_dense(qkv)  # [B, S, C]
            y = w8a8_matmul(out, w_int8, w_scale)
            return proj_back(qkv, y)
    elif kind == "c":  # bhsd kernel + XLA relayout + int8 dense proj
        def step(qkv):
            out = attn_bhsd(qkv)
            out = out.transpose(0, 2, 1, 3).reshape(B, -1, C)
            y = w8a8_matmul(out, w_int8, w_scale)
            return proj_back(qkv, y)
    elif kind == "d":  # dense-out kernel + bf16 dense proj
        def step(qkv):
            out = attn_dense(qkv)
            y = out @ w_bf16.astype(jnp.bfloat16)
            return proj_back(qkv, y)
    else:
        raise ValueError(kind)
    return step


def time_variant(kind, qkv0, weights, iters):
    step = make_variant(kind, *weights)

    @jax.jit
    def chained(qkv):
        qkv = jax.lax.fori_loop(0, iters, lambda i, s: step(s), qkv)
        return jnp.sum(qkv.astype(jnp.float32))

    float(chained(qkv0))  # compile + warm
    t0 = time.perf_counter()
    r = float(chained(qkv0))
    dt = time.perf_counter() - t0

    @jax.jit
    def nop(x):
        return jnp.sum(x.astype(jnp.float32))

    float(nop(qkv0))
    t1 = time.perf_counter()
    float(nop(qkv0))
    rtt = time.perf_counter() - t1
    ms = (dt - rtt) / iters * 1e3
    return ms, r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    qkv0 = jnp.asarray(
        rng.normal(0, 0.5, (B, HT, S, D)), jnp.bfloat16
    )
    wf = rng.normal(0, 0.02, (C, C)).astype(np.float32)
    aw = np.abs(wf).max(axis=0, keepdims=True)
    sw = np.maximum(aw, 1e-8) / 127.0
    w_int8 = jnp.asarray(np.clip(np.round(wf / sw), -127, 127), jnp.int8)
    w_scale = jnp.asarray(sw[0], jnp.float32)
    w_bf16 = jnp.asarray(wf)

    report = {}
    for kind, label in [
        ("a", "bhsd_kernel+bf16_headmajor_proj(r4)"),
        ("b", "dense_kernel+int8_proj(r5)"),
        ("c", "bhsd_kernel+relayout+int8_proj"),
        ("d", "dense_kernel+bf16_proj"),
    ]:
        ms, r = time_variant(
            kind, qkv0, (w_bf16, w_int8, w_scale), args.iters
        )
        report[label] = round(ms, 3)
        print(f"{label:42s} {ms:8.3f} ms/iter  (sink {r:.1f})")
    print(json.dumps(report))


if __name__ == "__main__":
    main()

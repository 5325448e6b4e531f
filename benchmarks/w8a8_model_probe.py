"""Why did W8A8 win less in model context than the raw matmul probe?

int8_xla_probe measured 1.7-2.0x bf16 on 2-D `lax.dot_general` at the
pipeline's shapes; the full pipeline gained only 9.77 -> 11.04 v/s and the
ViT encode gained NOTHING (159.4 -> 156.9 f/s). This probes the actual
module-level blocks to localize where the speedup dies:

  1. 3-D x 2-D standard dense ([B, S, C] @ [C, N]) — the LLM/ViT MLP form
  2. head-major einsum 'bsc,chd->bhsd' (int8) — the attention projections
  3. head-major-in einsum 'bhsd,hdc->bsc' (int8)
  4. the full ViT MLP block (fc1 + erf/tanh gelu + fc2) bf16 vs w8a8
  5. quantize_rows alone (is the activation-quant pass the overhead?)

Usage: python benchmarks/w8a8_model_probe.py
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

from aigv_assessor_tpu.ops.w8a8 import (
    quantize_rows,
    w8a8_head_major,
    w8a8_head_major_in,
    w8a8_matmul,
)


def time_chained(fn, args, iters=16):
    x0, rest = args[0], args[1:]

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, *rest, n):
        def body(i, x):
            out = fn(x, *rest)
            s = jnp.max(out)  # consume EVERY element (DCE trap)
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
    report = {}

    # ---- ViT MLP shapes: [64, 1032, 1024] x [1024, 4096] ----
    b, s, c, n = 64, 1032, 1024, 4096
    x = jnp.asarray(rng.normal(size=(b, s, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(c, n)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(n, c)) * 0.02, jnp.bfloat16)
    w1q = jnp.asarray(rng.integers(-127, 128, (c, n)), jnp.int8)
    w2q = jnp.asarray(rng.integers(-127, 128, (n, c)), jnp.int8)
    # realistic dequant scales (~0.02/127): random int8 weights with O(1)
    # scales overflow bf16 through two chained layers -> NaN in the
    # fold-back loop
    s1 = jnp.asarray((rng.random(n) + 0.5) * 2e-4, jnp.float32)
    s2 = jnp.asarray((rng.random(c) + 0.5) * 2e-4, jnp.float32)
    flops = 2 * b * s * c * n

    def mlp_bf16(x, w1, w2):
        h = jnp.einsum("bsc,cn->bsn", x, w1)
        h = jax.nn.gelu(h, approximate=True)
        return jnp.einsum("bsn,nc->bsc", h, w2)

    def mlp_w8a8(x, w1q, s1, w2q, s2):
        h = w8a8_matmul(x, w1q, s1)
        h = jax.nn.gelu(h, approximate=True)
        return w8a8_matmul(h, w2q, s2)

    t = time_chained(mlp_bf16, (x, w1, w2), 8)
    report["vit_mlp_bf16_ms"] = round(t * 1e3, 3)
    report["vit_mlp_bf16_tflops"] = round(2 * flops / t / 1e12, 1)
    t = time_chained(mlp_w8a8, (x, w1q, s1, w2q, s2), 8)
    report["vit_mlp_w8a8_ms"] = round(t * 1e3, 3)
    report["vit_mlp_w8a8_tops"] = round(2 * flops / t / 1e12, 1)
    print("vit_mlp", json.dumps(report), flush=True)

    # ---- 3-D standard dense alone ----
    t = time_chained(lambda x, w: jnp.einsum("bsc,cn->bsn", x, w), (x, w1), 8)
    report["dense3d_bf16_ms"] = round(t * 1e3, 3)
    report["dense3d_bf16_tflops"] = round(flops / t / 1e12, 1)
    t = time_chained(lambda x, w, sc: w8a8_matmul(x, w, sc), (x, w1q, s1), 8)
    report["dense3d_w8a8_ms"] = round(t * 1e3, 3)
    report["dense3d_w8a8_tops"] = round(flops / t / 1e12, 1)
    print("dense3d", json.dumps(
        {k: v for k, v in report.items() if k.startswith("dense3d")}
    ), flush=True)

    # ---- quantize_rows alone ----
    t = time_chained(lambda x: quantize_rows(x)[0].astype(jnp.bfloat16), (x,), 8)
    report["quantize_rows_ms"] = round(t * 1e3, 3)
    print("quantize_rows", report["quantize_rows_ms"], "ms", flush=True)

    # ---- head-major projections (ViT qkv shape: heads=48, d=64) ----
    heads, d = 48, 64
    wq = jnp.asarray(rng.integers(-127, 128, (c, heads * d)), jnp.int8)
    wqb = jnp.asarray(rng.normal(size=(c, heads * d)) * 0.02, jnp.bfloat16)
    sq = jnp.asarray((rng.random(heads * d) + 0.5) * 2e-4, jnp.float32)
    hm_flops = 2 * b * s * c * heads * d

    def hm_bf16(x, w):
        return jnp.einsum("bsc,chd->bhsd", x, w.reshape(c, heads, d))

    t = time_chained(hm_bf16, (x, wqb), 8)
    report["headmajor_bf16_ms"] = round(t * 1e3, 3)
    report["headmajor_bf16_tflops"] = round(hm_flops / t / 1e12, 1)
    t = time_chained(
        lambda x, w, sc: w8a8_head_major(x, w, sc, heads), (x, wq, sq), 8
    )
    report["headmajor_w8a8_ms"] = round(t * 1e3, 3)
    report["headmajor_w8a8_tops"] = round(hm_flops / t / 1e12, 1)
    print("headmajor", json.dumps(
        {k: v for k, v in report.items() if k.startswith("headmajor")}
    ), flush=True)

    # ---- head-major-in (out-projection) ----
    hh = 16  # post-attention heads for the proj shape [64, 16, 1032, 64]
    xh = jnp.asarray(rng.normal(size=(b, hh, s, hh * 0 + 64)), jnp.bfloat16)
    wo = jnp.asarray(rng.integers(-127, 128, (hh * 64, c)), jnp.int8)
    wob = jnp.asarray(rng.normal(size=(hh * 64, c)) * 0.02, jnp.bfloat16)
    so = jnp.asarray((rng.random(c) + 0.5) * 2e-4, jnp.float32)
    hmi_flops = 2 * b * s * hh * 64 * c

    def hmi_bf16(x, w):
        return jnp.einsum("bhsd,hdc->bsc", x, w.reshape(hh, 64, c))

    t = time_chained(hmi_bf16, (xh, wob), 8)
    report["headmajor_in_bf16_ms"] = round(t * 1e3, 3)
    report["headmajor_in_bf16_tflops"] = round(hmi_flops / t / 1e12, 1)
    t = time_chained(
        lambda x, w, sc: w8a8_head_major_in(x, w, sc), (xh, wo, so), 8
    )
    report["headmajor_in_w8a8_ms"] = round(t * 1e3, 3)
    report["headmajor_in_w8a8_tops"] = round(hmi_flops / t / 1e12, 1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()

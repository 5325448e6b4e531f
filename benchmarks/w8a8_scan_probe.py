"""Does the int8 MXU path survive lax.scan over stacked weights?

w8a8_model_probe found the chained ViT MLP at 233 TOPS standalone (1.22x
bf16), yet the full ViT encode gains NOTHING from w8a8 (159.4 -> 156.9
f/s, BENCH round 4). The encoder scans over layers, so every int8 kernel
is a dynamic_slice out of a stacked [L, K, N] int8 array — this probes
whether that form still lowers to the native int8 MXU path.

Variants (all = L sequential MLP blocks on ViT shapes):
  unrolled_bf16 / unrolled_w8a8: python-loop over per-layer weights
  scan_bf16 / scan_w8a8: lax.scan over stacked [L, ...] weights

Usage: python benchmarks/w8a8_scan_probe.py
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

from aigv_assessor_tpu.ops.w8a8 import w8a8_matmul


def time_chained(fn, args, iters=4):
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
    L, b, s, c, n = 8, 64, 1032, 1024, 4096
    x = jnp.asarray(rng.normal(size=(b, s, c)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(L, c, n)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(L, n, c)) * 0.02, jnp.bfloat16)
    w1q = jnp.asarray(rng.integers(-127, 128, (L, c, n)), jnp.int8)
    w2q = jnp.asarray(rng.integers(-127, 128, (L, n, c)), jnp.int8)
    s1 = jnp.asarray((rng.random((L, n)) + 0.5) * 2e-4, jnp.float32)
    s2 = jnp.asarray((rng.random((L, c)) + 0.5) * 2e-4, jnp.float32)
    flops = 2 * 2 * L * b * s * c * n
    report = {}

    def blk_bf16(x, w1, w2):
        h = jnp.einsum("bsc,cn->bsn", x, w1)
        h = jax.nn.gelu(h, approximate=True)
        return jnp.einsum("bsn,nc->bsc", h, w2)

    def blk_w8a8(x, w1, sc1, w2, sc2):
        h = w8a8_matmul(x, w1, sc1)
        h = jax.nn.gelu(h, approximate=True)
        return w8a8_matmul(h, w2, sc2)

    def unrolled_bf16(x, w1, w2):
        for i in range(L):
            x = blk_bf16(x, w1[i], w2[i])
        return x

    def unrolled_w8a8(x, w1, s1, w2, s2):
        for i in range(L):
            x = blk_w8a8(x, w1[i], s1[i], w2[i], s2[i])
        return x

    def scan_bf16(x, w1, w2):
        def body(carry, ws):
            return blk_bf16(carry, ws[0], ws[1]), None

        out, _ = jax.lax.scan(body, x, (w1, w2))
        return out

    def scan_w8a8(x, w1, s1, w2, s2):
        def body(carry, ws):
            return blk_w8a8(carry, *ws), None

        out, _ = jax.lax.scan(body, x, (w1, s1, w2, s2))
        return out

    for name, fn, args in (
        ("unrolled_bf16", unrolled_bf16, (x, w1, w2)),
        ("unrolled_w8a8", unrolled_w8a8, (x, w1q, s1, w2q, s2)),
        ("scan_bf16", scan_bf16, (x, w1, w2)),
        ("scan_w8a8", scan_w8a8, (x, w1q, s1, w2q, s2)),
    ):
        t = time_chained(fn, args, 4)
        report[name + "_ms"] = round(t * 1e3, 3)
        report[name + "_tops"] = round(flops / t / 1e12, 1)
        print(name, report[name + "_ms"], "ms",
              report[name + "_tops"], "TOPS", flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()

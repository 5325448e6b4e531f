"""Fused norm/gelu+quantize kernels vs the two-op XLA chain (ViT shapes).

The W8A8 ViT gains almost nothing end-to-end because every int8 dot is
fed by a separate quantize pass (absmax + scale+cast = 2 extra HBM
passes). `ops/quant_fuse.py` fuses the producer (LayerNorm / tanh-GELU)
with the quantizer in one Pallas kernel: one bf16 read, int8 write.

Sections:
  ln:    norm1/norm2 feed   [64*1032, 1024]
  gelu:  fc1 -> fc2 feed    [64*1032, 4096]
  mlp:   ln+fc1+gelu+fc2 block, XLA-quant vs fused-quant end-to-end

Usage: python benchmarks/quant_fuse_probe.py
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

from aigv_assessor_tpu.ops import quant_fuse as qf
from aigv_assessor_tpu.ops.norms import layer_norm
from aigv_assessor_tpu.ops.w8a8 import quantize_rows


def time_chained(fn, args, iters=16):
    """Median slope of a fori-chained loop; the carry folds a full
    reduction of every output back into the input (anti-DCE rule,
    BENCH_NOTES 'measurement traps')."""
    x0, rest = args[0], args[1:]

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, *rest, n):
        def body(i, x):
            outs = fn(x, *rest)
            s = sum(
                jnp.max(o.astype(jnp.float32)) for o in jax.tree.leaves(outs)
            )
            return x.at[:1].set(
                jnp.broadcast_to(s.astype(x.dtype), x.shape[1:])[None]
            )

        x = jax.lax.fori_loop(0, n, body, x)
        outs = fn(x, *rest)
        return sum(
            jnp.sum(o.astype(jnp.float32)) for o in jax.tree.leaves(outs)
        )

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
    b, s, c, n = 64, 1032, 1024, 4096
    r = b * s

    # ---- correctness first (tiny) ----
    xs = jnp.asarray(rng.normal(size=(8, 256)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(256,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(256,)) * 0.1, jnp.float32)
    q1, s1 = qf.layernorm_quant(xs, g, be)
    q2, s2 = qf._layernorm_quant_xla(xs, g, be, 1e-6)
    assert np.abs(np.asarray(q1, np.int32) - np.asarray(q2, np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    q1, s1 = qf.gelu_quant(xs)
    q2, s2 = qf._gelu_quant_xla(xs)
    assert np.abs(np.asarray(q1, np.int32) - np.asarray(q2, np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    q1, s1 = qf.rmsnorm_quant(xs, g)
    q2, s2 = qf._rmsnorm_quant_xla(xs, g, 1e-5)
    assert np.abs(np.asarray(q1, np.int32) - np.asarray(q2, np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    x2b = jnp.asarray(rng.normal(size=(8, 256)), jnp.bfloat16)
    q1, s1 = qf.silu_mul_quant(xs, x2b)
    q2, s2 = qf._silu_mul_quant_xla(xs, x2b)
    assert np.abs(np.asarray(q1, np.int32) - np.asarray(q2, np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    # ragged rows (LLM prefill is B*S with S odd, e.g. 4*2113): the cdiv
    # grid's trailing block must mask its stores — verify full arrays match
    xr = jnp.asarray(rng.normal(size=(4, 2113, 256)), jnp.bfloat16)
    gr = jnp.asarray(rng.normal(size=(256,)) * 0.1 + 1.0, jnp.float32)
    q1, s1 = qf.rmsnorm_quant(xr, gr)
    q2, s2 = qf._rmsnorm_quant_xla(xr, gr, 1e-5)
    assert np.abs(np.asarray(q1, np.int32) - np.asarray(q2, np.int32)).max() <= 1
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
    print("correctness ok (incl. ragged rows)", flush=True)

    # ---- ln feed ----
    x = jnp.asarray(rng.normal(size=(r, c)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(c,)) * 0.1 + 1.0, jnp.float32)
    be = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)

    def ln_quant_xla(x, g, be):
        y = layer_norm(x, g, be, 1e-6).astype(jnp.bfloat16)
        return quantize_rows(y)

    for name, fn in (
        ("ln_quant_xla", ln_quant_xla),
        ("ln_quant_fused", lambda x, g, be: qf.layernorm_quant(x, g, be)),
    ):
        t = time_chained(fn, (x, g, be))
        report[name + "_ms"] = round(t * 1e3, 3)
        print(name, report[name + "_ms"], "ms", flush=True)

    # ---- gelu feed (4096-wide) ----
    xw = jnp.asarray(rng.normal(size=(r, n)), jnp.bfloat16)

    def gelu_quant_xla(x):
        return quantize_rows(jax.nn.gelu(x, approximate=True))

    for name, fn in (
        ("gelu_quant_xla", gelu_quant_xla),
        ("gelu_quant_fused", qf.gelu_quant),
    ):
        t = time_chained(fn, (xw,))
        report[name + "_ms"] = round(t * 1e3, 3)
        print(name, report[name + "_ms"], "ms", flush=True)

    # ---- full MLP block: ln -> fc1(int8) -> gelu -> fc2(int8) ----
    x3 = jnp.asarray(rng.normal(size=(b, s, c)), jnp.bfloat16)
    w1q = jnp.asarray(rng.integers(-127, 128, (c, n)), jnp.int8)
    w2q = jnp.asarray(rng.integers(-127, 128, (n, c)), jnp.int8)
    s1w = jnp.asarray((rng.random(n) + 0.5) * 2e-4, jnp.float32)
    s2w = jnp.asarray((rng.random(c) + 0.5) * 2e-4, jnp.float32)
    flops = 2 * 2 * b * s * c * n

    def dot_i8(xq, sx, w, sw):
        acc = jax.lax.dot_general(
            xq, w, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * sx * sw).astype(jnp.bfloat16)

    def mlp_xla_quant(x, g, be, w1, s1_, w2, s2_):
        y = layer_norm(x, g, be, 1e-6).astype(jnp.bfloat16)
        xq, sx = quantize_rows(y)
        h = dot_i8(xq, sx, w1, s1_)
        hq, sh = quantize_rows(jax.nn.gelu(h, approximate=True))
        return dot_i8(hq, sh, w2, s2_)

    def mlp_fused_quant(x, g, be, w1, s1_, w2, s2_):
        xq, sx = qf.layernorm_quant(x, g, be)
        h = dot_i8(xq, sx, w1, s1_)
        hq, sh = qf.gelu_quant(h)
        return dot_i8(hq, sh, w2, s2_)

    for name, fn in (
        ("mlp_xla_quant", mlp_xla_quant),
        ("mlp_fused_quant", mlp_fused_quant),
    ):
        t = time_chained(fn, (x3, g, be, w1q, s1w, w2q, s2w), iters=8)
        report[name + "_ms"] = round(t * 1e3, 3)
        report[name + "_tops"] = round(flops / t / 1e12, 1)
        print(name, report[name + "_ms"], "ms",
              report[name + "_tops"], "TOPS", flush=True)

    # ---- LLM shapes: rmsnorm feed [8448, 2048], silu-mul feed [8448, 8192]
    from aigv_assessor_tpu.ops.norms import rms_norm

    rl, cl, il = 8448, 2048, 8192
    xl = jnp.asarray(rng.normal(size=(rl, cl)), jnp.bfloat16)
    gl = jnp.asarray(rng.normal(size=(cl,)) * 0.1 + 1.0, jnp.float32)

    def rms_quant_xla(x, g):
        return quantize_rows(rms_norm(x, g, 1e-5).astype(jnp.bfloat16))

    for name, fn in (
        ("rms_quant_xla", rms_quant_xla),
        ("rms_quant_fused", lambda x, g: qf.rmsnorm_quant(x, g)),
    ):
        t = time_chained(fn, (xl, gl))
        report[name + "_ms"] = round(t * 1e3, 3)
        print(name, report[name + "_ms"], "ms", flush=True)

    h1 = jnp.asarray(rng.normal(size=(rl, il)), jnp.bfloat16)
    h3 = jnp.asarray(rng.normal(size=(rl, il)), jnp.bfloat16)

    def silu_mul_quant_xla(h1, h3):
        return quantize_rows(jax.nn.silu(h1) * h3)

    for name, fn in (
        ("silu_mul_quant_xla", silu_mul_quant_xla),
        ("silu_mul_quant_fused", qf.silu_mul_quant),
    ):
        t = time_chained(fn, (h1, h3))
        report[name + "_ms"] = round(t * 1e3, 3)
        print(name, report[name + "_ms"], "ms", flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()

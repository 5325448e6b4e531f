"""fp8 (e4m3) weight streaming for decode: probe the VERDICT-10 lever.

The int4 decode path wins (232 tok/s vs 217 bf16 ceiling at 2B bs=1) but
its in-kernel nibble unpack needs ~3 lane-ops per weight — a ~1.5 ms/token
VPU floor (BENCH_NOTES round 3). fp8 weights stream HALF the bf16 bytes
(2x int4's) but need only ONE convert per weight. If the fp8->bf16 cast
lowers on this Mosaic/XLA, its ceiling sits between the two:
  bf16 217 tok/s | fp8 ~380 DMA-bound | int4 ~300-350 unpack-bound.

Three candidates on the 2B decode matvec shapes, chained-slope protocol:
  xla_bf16   jnp.dot(x, w_bf16)                      (control; ~807 GB/s)
  xla_fp8    jnp.dot(x, w_fp8.astype(bf16) * scale)  (XLA fuses the upcast
             into the dot's operand stream, or materializes — measured)
  pallas_fp8 int8_matmul-style kernel, in-kernel cast
  int4       ops/int8_matmul.int4_matmul             (current champion)

Usage: python benchmarks/fp8_decode_probe.py
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
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aigv_assessor_tpu.ops.int8_matmul import _cdiv, int4_matmul


def _fp8_kernel(x_ref, w_ref, scale_ref, o_ref, *, block_k, k_total):
    bm, bn = o_ref.shape
    nk = _cdiv(k_total, block_k)

    def body(i, acc):
        w = w_ref[pl.ds(i * block_k, block_k), :].astype(x_ref.dtype)
        x = x_ref[:, pl.ds(i * block_k, block_k)]
        return acc + lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    acc = lax.fori_loop(0, nk, body, jnp.zeros((bm, bn), jnp.float32))
    o_ref[...] = (acc * scale_ref[0, :][None, :]).astype(o_ref.dtype)


def fp8_matmul(x, w_fp8, scale, block_n=2048, block_k=512,
               out_dtype=jnp.bfloat16):
    m, k = x.shape
    kw, n = w_fp8.shape
    assert kw == k
    bm = max(8, _cdiv(m, 8) * 8)
    bn = min(block_n, _cdiv(n, 128) * 128)
    # the whole-k weight column block lives in VMEM (double-buffered) and
    # each fori step casts a [bk, bn] slice to bf16: cap the column block
    # at ~2 MB fp8 so block + cast temporaries fit the 16 MB budget
    bn = min(bn, max(128, (2 * 1024 * 1024 // k) // 128 * 128))
    bk = min(block_k, k)
    m_pad = _cdiv(m, bm) * bm
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    n_pad = _cdiv(n, bn) * bn
    k_pad = _cdiv(k, bk) * bk
    if n_pad != n or k_pad != k:
        w_fp8 = jnp.pad(w_fp8, ((0, k_pad - k), (0, n_pad - n)))
        scale = jnp.pad(scale, (0, n_pad - n), constant_values=1.0)
        x = jnp.pad(x, ((0, 0), (0, k_pad - k)))
    scale2 = scale.reshape(1, n_pad).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(_fp8_kernel, block_k=bk, k_total=k_pad),
        grid=(m_pad // bm, n_pad // bn),
        in_specs=[
            pl.BlockSpec((bm, k_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=x.size * 2 + w_fp8.size + n_pad * 4,
            transcendentals=0,
        ),
    )(x, w_fp8, scale2)
    return out[:m, :n]


def time_chained(fn, args, iters=64):
    x0, rest = args[0], args[1:]

    @functools.partial(jax.jit, static_argnames=("n",))
    def run(x, *rest, n):
        def body(i, x):
            out = fn(x, *rest)
            s = jnp.max(out.astype(jnp.float32))
            return x.at[:1, :1].set(s.astype(x.dtype) * 1e-6)

        x = jax.lax.fori_loop(0, n, body, x)
        return jnp.sum(fn(x, *rest).astype(jnp.float32))

    for n in (iters, 4 * iters):
        assert np.isfinite(float(run(x0, *rest, n=n)))
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
    shapes = {
        "wqkv_2048x4096": (2048, 4096),
        "w13_2048x16384": (2048, 16384),
        "w2_8192x2048": (8192, 2048),
    }
    m = 8  # padded decode row block (bs=1 pads to 8 sublanes anyway)
    for name, (k, n) in shapes.items():
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        wf = rng.normal(size=(k, n)).astype(np.float32) * 0.02
        w_bf16 = jnp.asarray(wf, jnp.bfloat16)
        # per-channel absmax scaling into e4m3's [-448, 448]
        ax = np.abs(wf).max(axis=0)
        scale = np.maximum(ax, 1e-8) / 448.0
        w_fp8 = jnp.asarray(wf / scale, jnp.float8_e4m3fn)
        scale_j = jnp.asarray(scale, jnp.float32)
        w4 = np.clip(np.round(wf / (np.maximum(ax, 1e-8) / 7.0)), -8, 7)
        packed = ((w4[1::2].astype(np.int8) << 4)
                  | (w4[0::2].astype(np.int8) & 0xF)).astype(np.int8)
        w4p = jnp.asarray(packed)
        s4 = jnp.asarray(np.maximum(ax, 1e-8) / 7.0, jnp.float32)

        # correctness of the fp8 paths vs float
        y_ref = np.asarray(x, np.float32) @ wf
        y8 = np.asarray(
            jax.jit(lambda x, w, s: fp8_matmul(x, w, s))(x, w_fp8, scale_j),
            np.float32,
        )
        rel = np.abs(y8 - y_ref).max() / max(np.abs(y_ref).max(), 1e-9)
        report[f"{name}_fp8_rel_err"] = round(float(rel), 5)

        cands = {
            "xla_bf16": (lambda x, w=w_bf16: jnp.dot(
                x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)),
            "xla_fp8": (lambda x, w=w_fp8, s=scale_j: jnp.dot(
                x, w.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16) * s.astype(jnp.bfloat16)),
            "pallas_fp8": (lambda x, w=w_fp8, s=scale_j: fp8_matmul(x, w, s)),
            "int4": (lambda x, w=w4p, s=s4: int4_matmul(x, w, s)),
        }
        for cname, fn in cands.items():
            try:
                t = time_chained(fn, (x,))
                gbs = (k * n * {"xla_bf16": 2, "xla_fp8": 1,
                                "pallas_fp8": 1, "int4": 0.5}[cname]) / t / 1e9
                report[f"{name}_{cname}_us"] = round(t * 1e6, 1)
                report[f"{name}_{cname}_gbps"] = round(gbs, 1)
            except Exception as e:  # pragma: no cover
                report[f"{name}_{cname}_err"] = repr(e)[:160]
            print(name, cname,
                  report.get(f"{name}_{cname}_us"),
                  report.get(f"{name}_{cname}_gbps"),
                  report.get(f"{name}_{cname}_err", ""), flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()

"""Int8-weight matmul kernel (serving building block).

TPU-native replacement for bitsandbytes' int8 inference path
(`/root/reference/requirements.txt:2`, `internvl/model/__init__.py:41`
8-bit load): weights live in HBM as per-output-channel symmetric int8
(the format written by `tools/convert_to_int8.py`); the kernel DMAs the int8
bytes (halving weight-streaming bandwidth — the binding constraint of
autoregressive decode, measured ~410 GB/s of 819 peak at 2B bs=1) and
dequantizes in VMEM right before the MXU dot.

    y[M, N] = (x[M, K] @ (w_int8[K, N] * scale[N]))  — computed as
    (x @ w_bf16_tile) * scale with the cast fused in-kernel.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp

from aigv_assessor_tpu.ops.attention import _on_tpu
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _kernel(x_ref, w_ref, scale_ref, o_ref, *, block_k, k_total):
    """x [BM, K] bf16; w [K, BN] int8; scale [1, BN] f32; o [BM, BN]."""
    bm = x_ref.shape[0]
    bn = w_ref.shape[1]
    nk = _cdiv(k_total, block_k)

    def body(i, acc):
        x_blk = x_ref[:, pl.ds(i * block_k, block_k)]
        w_blk = w_ref[pl.ds(i * block_k, block_k), :]  # int8 in VMEM
        w_deq = w_blk.astype(x_blk.dtype)  # cast on the VPU, not in HBM
        return acc + lax.dot_general(
            x_blk, w_deq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = lax.fori_loop(0, nk, body, jnp.zeros((bm, bn), jnp.float32))
    o_ref[...] = (acc * scale_ref[0, :][None, :]).astype(o_ref.dtype)


# NOT jax.jit-wrapped: callers run these inside the model's jit, and a
# nested jit is a fusion boundary (measured +3.7 ms/layer on the ViT —
# ops/attention.py:82). Standalone benchmarks wrap them in jax.jit
# themselves; every non-array argument is a static Python value either way.
def int8_matmul(
    x: jnp.ndarray,  # [M, K] bf16/f32
    w_int8: jnp.ndarray,  # [K, N] int8
    scale: jnp.ndarray,  # [N] f32 (per-output-channel)
    block_m: int = 256,
    block_n: int | None = None,
    block_k: int | None = None,
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    m, k = x.shape
    k2, n = w_int8.shape
    assert k == k2 and scale.shape == (n,)

    # same ~2 MB-weight-block auto-selection as int4_matmul (swept there;
    # the old fixed 512/512 made the int8 lm_head SLOWER than bf16)
    if block_n is None:
        block_n = max(512, min(2048, (2 * 1024 * 1024 // max(k, 1)) // 128 * 128))
    if block_k is None:
        block_k = k if k <= 2048 else 512

    bm = min(block_m, max(8, _cdiv(m, 8) * 8))
    bn = min(block_n, _cdiv(n, 128) * 128)
    bk = min(block_k, k)

    m_pad = _cdiv(m, bm) * bm
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    # pad n (e.g. vocab 92553) and k to block multiples; zero weight columns
    # produce zero outputs that are sliced away
    n_pad = _cdiv(n, bn) * bn
    k_pad = _cdiv(k, bk) * bk
    if n_pad != n or k_pad != k:
        w_int8 = jnp.pad(w_int8, ((0, k_pad - k), (0, n_pad - n)))
        scale = jnp.pad(scale, (0, n_pad - n), constant_values=1.0)
    if k_pad != k:
        x = jnp.pad(x, ((0, 0), (0, k_pad - k)))
    scale2 = scale.reshape(1, n_pad).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, block_k=bk, k_total=k_pad),
        grid=(m_pad // bm, n_pad // bn),
        in_specs=[
            pl.BlockSpec((bm, k_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * k_pad,
            bytes_accessed=x.size * x.dtype.itemsize + w_int8.size + n_pad * 4,
            transcendentals=0,
        ),
    )(x, w_int8, scale2)
    return out[:m, :n]


def _int4_kernel(
    xe_ref, xo_ref, w_ref, scale_ref, o_ref, *, block_k2, k2_total,
    unpack_dtype=jnp.int32,
):
    """W4A16 matmul with in-kernel nibble unpack.

    xe/xo [BM, K/2] bf16 (even / odd rows of the activation's K dim);
    w [K/2, BN] int8 — each byte packs weight rows (2i, 2i+1) as
    (lo nibble, hi nibble), the `tools/convert_to_int8.py --bits 4` layout.
    Because x is pre-split even/odd, the unpacked nibbles are used IN PLACE:
        y = x_even @ lo + x_odd @ hi
    — no sublane interleave/relayout of the unpacked weights, just two
    VPU shifts + casts per byte ahead of two MXU dots. DMA streams 4 bits
    per weight: a quarter of the bf16 bytes (the decode-binding HBM
    traffic; bf16 ceiling 217 tok/s at 2B bs=1, BENCH_NOTES.md)."""
    bm = xe_ref.shape[0]
    bn = w_ref.shape[1]
    nk = _cdiv(k2_total, block_k2)

    sh = 8 * jnp.dtype(unpack_dtype).itemsize - 4

    def body(i, acc):
        w_blk = w_ref[pl.ds(i * block_k2, block_k2), :]  # packed int8
        # sign-extended nibbles; shifts run in a wider int type (Mosaic
        # does not legalize arith.shli on int8 vectors — int32 and int16
        # both lower; int16 processes 2x lanes per VPU op). The widened
        # value is sign-extended from int8, so the HI nibble needs only
        # ONE arithmetic shift (bit 7 == its sign bit); 3 shifts/byte
        wi = w_blk.astype(unpack_dtype)
        lo = ((wi << sh) >> sh).astype(xe_ref.dtype)
        hi = (wi >> 4).astype(xe_ref.dtype)
        xe = xe_ref[:, pl.ds(i * block_k2, block_k2)]
        xo = xo_ref[:, pl.ds(i * block_k2, block_k2)]
        acc = acc + lax.dot_general(
            xe, lo, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc + lax.dot_general(
            xo, hi, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    acc = lax.fori_loop(0, nk, body, jnp.zeros((bm, bn), jnp.float32))
    o_ref[...] = (acc * scale_ref[0, :][None, :]).astype(o_ref.dtype)


def int4_matmul(
    x: jnp.ndarray,  # [M, K] bf16/f32
    w_packed: jnp.ndarray,  # [ceil(K/2), N] int8 (nibble-packed int4)
    scale: jnp.ndarray,  # [N] f32 per-output-channel
    block_m: int = 256,
    block_n: int | None = None,
    block_k: int | None = None,  # in UNPACKED k units
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    unpack_dtype=jnp.int32,
) -> jnp.ndarray:
    m, k = x.shape
    k2, n = w_packed.shape
    assert k2 == _cdiv(k, 2), (k2, k)
    assert scale.shape == (n,)

    # Auto block selection (swept at the 2B decode shapes,
    # benchmarks/int4_block_sweep.py): target a ~2 MB packed-weight block
    # [k2, bn] per grid step — wide-n shallow-k shapes (w1/w3 2048->16384)
    # run 2.3x faster at bn=2048 than 512, while deep-k shapes
    # (w2 8192->2048) invert and want bn=512. bk: the full k when it fits
    # the same budget, else 512.
    if block_n is None:
        block_n = max(512, min(2048, (2 * 1024 * 1024 // max(k2, 1)) // 128 * 128))
    if block_k is None:
        block_k = k if k <= 2048 else 512

    if k % 2:
        x = jnp.pad(x, ((0, 0), (0, 1)))
        k += 1
    # split activations into even/odd K rows to match the nibble layout
    x3 = x.reshape(m, k // 2, 2)
    xe, xo = x3[:, :, 0], x3[:, :, 1]

    bm = min(block_m, max(8, _cdiv(m, 8) * 8))
    bn = min(block_n, _cdiv(n, 128) * 128)
    bk2 = min(block_k // 2, k2)

    m_pad = _cdiv(m, bm) * bm
    if m_pad != m:
        xe = jnp.pad(xe, ((0, m_pad - m), (0, 0)))
        xo = jnp.pad(xo, ((0, m_pad - m), (0, 0)))
    n_pad = _cdiv(n, bn) * bn
    k2_pad = _cdiv(k2, bk2) * bk2
    if n_pad != n or k2_pad != k2:
        w_packed = jnp.pad(w_packed, ((0, k2_pad - k2), (0, n_pad - n)))
        scale = jnp.pad(scale, (0, n_pad - n), constant_values=1.0)
    if k2_pad != k2:
        xe = jnp.pad(xe, ((0, 0), (0, k2_pad - k2)))
        xo = jnp.pad(xo, ((0, 0), (0, k2_pad - k2)))
    scale2 = scale.reshape(1, n_pad).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(
            _int4_kernel, block_k2=bk2, k2_total=k2_pad,
            unpack_dtype=unpack_dtype,
        ),
        grid=(m_pad // bm, n_pad // bn),
        in_specs=[
            pl.BlockSpec((bm, k2_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, k2_pad), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k2_pad, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad, n_pad), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_pad * n_pad * 2 * k2_pad,
            bytes_accessed=2 * xe.size * x.dtype.itemsize
            + w_packed.size
            + n_pad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xe, xo, w_packed, scale2)
    return out[:m, :n]


def int4_dense_apply(
    x: jnp.ndarray,  # [..., K]
    kernel_int4: jnp.ndarray,  # [ceil(K/2), N] packed
    scale: jnp.ndarray,  # [N] f32
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Dense forward over nibble-packed int4 weights (W4A16): pallas on TPU,
    dequantized XLA matmul elsewhere."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = kernel_int4.shape[1]
    x2 = x.reshape(-1, k)
    if _on_tpu():
        y = int4_matmul(x2, kernel_int4, scale, out_dtype=out_dtype)
    else:
        # traceable dequant (rows interleave as (2i, 2i+1) = (lo, hi))
        k2 = kernel_int4.shape[0]
        w32 = kernel_int4.astype(jnp.int32)
        lo = (w32 << 28) >> 28
        hi = w32 >> 4  # sign-extended int8: one arithmetic shift suffices
        q = jnp.stack([lo, hi], axis=1).reshape(2 * k2, n)[:k]
        w = q.astype(jnp.float32) * scale[None, :]
        y = (x2.astype(jnp.float32) @ w).astype(out_dtype)
    return y.reshape(lead + (n,))


def quantize_weight(w: jnp.ndarray):
    """[K, N] float -> (int8 [K, N], scale [N]); matches
    tools/convert_to_int8.quantize_kernel."""
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale[0].astype(jnp.float32)


def int8_dense_apply(
    x: jnp.ndarray,  # [..., K] activations (bf16/f32)
    kernel_int8: jnp.ndarray,  # [K, N]
    scale: jnp.ndarray,  # [N] f32
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Dense forward over int8 weights with arbitrary leading dims:
    pallas kernel on TPU, dequantized XLA matmul elsewhere. W8A16: the int8
    bytes halve HBM weight streaming; activations stay bf16."""
    lead = x.shape[:-1]
    k = x.shape[-1]
    n = kernel_int8.shape[1]
    x2 = x.reshape(-1, k)
    if _on_tpu():
        y = int8_matmul(x2, kernel_int8, scale, out_dtype=out_dtype)
    else:
        w = kernel_int8.astype(jnp.float32) * scale[None, :]
        y = (x2.astype(jnp.float32) @ w).astype(out_dtype)
    return y.reshape(lead + (n,))

"""Fused elementwise+quantize kernels: cut the HBM passes that W8A8 adds.

Per-token activation quantization (`ops/w8a8.quantize_rows`) costs two
full passes over the activation in XLA (absmax reduce, then scale+cast)
ON TOP of the producer's own read/write — measured 0.405 ms on
[64,1032,1024] and ~1.6 ms on the 4096-wide gelu output, which together
eat most of the int8 MXU win inside the ViT (BENCH_NOTES round 4). These
Pallas kernels produce int8 + per-row fp32 scales in ONE read of the
input:

- `layernorm_quant(x, gamma, beta)`: LayerNorm -> absmax -> int8, i.e.
  the norm1/norm2 -> qkv/fc1 feeds in the ViT encoder layer
  (reference `modeling_intern_vit.py` norm1/norm2 + nn.Linear, re-fused
  for the TPU's HBM-bound regime rather than translated);
- `gelu_quant(x)`: tanh-GELU -> absmax -> int8, the fc1 -> fc2 feed;
- `rmsnorm_quant(x, gamma)`: RMSNorm -> int8, the attention_norm/ffn_norm
  -> wqkv/w13 feeds in the InternLM2 decoder;
- `silu_mul_quant(h1, h3)`: silu(h1)*h3 -> int8, the SwiGLU -> w2 feed
  (the widest activation in the LLM: 8192 at 2B).

Each has an XLA fallback (same math, used off-TPU and under vmap/jvp
tracing) and is exact to ~1 ulp of the two-pass version: stats and
quantization run in fp32 either way.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aigv_assessor_tpu.ops.attention import _on_tpu


def fuse_enabled(component: str = "vit") -> bool:
    """Gate for the fused producer+quantize feeds in the models (the
    kernels themselves stay callable either way).

    Default: ON for the ViT (A/B'd +5% encode, 190.8 -> 198.4 f/s), OFF
    for the LLM decoder — the same kernels WIN standalone there
    (rms 0.056 vs 0.093 ms, silu-mul 0.614 vs 0.726) but LOSE 12%
    in-model (pipeline 12.25 -> 10.93 v/s, A/B/A in one process,
    BENCH_NOTES round 4): under nn.scan the Pallas call's int8+scale
    outputs break XLA's overlap of the quantize with the neighbouring
    dots. AIGV_FUSE_QUANT overrides: '0' all off, '1' all on, or a
    comma list of components ('vit', 'llm')."""
    v = os.environ.get("AIGV_FUSE_QUANT", "vit")
    if v == "0":
        return False
    if v == "1":
        return True
    return component in v.split(",")

def quant_rows_enabled(component: str = "vit") -> bool:
    """Gate for the one-pass attention-output quantize feed (`quant_rows`
    between the flash kernel's [B,S,H*D] output and the int8 wo/proj dot).

    Separate from `fuse_enabled` because the trade-off is different: this
    replaces a standalone XLA quantize whose producer is an opaque Pallas
    call (nothing for XLA to fuse it into), not a fusable norm/gelu.
    AIGV_QUANT_ROWS overrides: '0' all off, '1' all on, or a comma list of
    components ('vit', 'llm'). Default set by the round-5 model A/B."""
    v = os.environ.get("AIGV_QUANT_ROWS", "vit")
    if v == "0":
        return False
    if v == "1":
        return True
    return component in v.split(",")


_SQRT_2_OVER_PI = 0.7978845608028654


def _gelu_tanh(x):
    # tanh-approximate GELU (the ViT's approximate_gelu=True lowering;
    # exact-erf is a long VPU chain, BENCH_NOTES round 2)
    return 0.5 * x * (1.0 + jnp.tanh(_SQRT_2_OVER_PI * (x + 0.044715 * x * x * x)))


def _quantize_f32(y):
    ax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(ax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    return q, s


# ------------------------------------------------------------------ XLA ---


def _layernorm_quant_xla(x, gamma, beta, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return _quantize_f32(y)


def _gelu_quant_xla(x):
    return _quantize_f32(_gelu_tanh(x.astype(jnp.float32)))


def _rmsnorm_quant_xla(x, gamma, eps):
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
    return _quantize_f32(y * gamma.astype(jnp.float32))


def _silu_mul_quant_xla(h1, h3):
    y = jax.nn.silu(h1.astype(jnp.float32)) * h3.astype(jnp.float32)
    return _quantize_f32(y)


# --------------------------------------------------------------- Pallas ---


def _ln_quant_kernel(x_ref, g_ref, b_ref, eps_ref, q_ref, s_ref):
    x = x_ref[:].astype(jnp.float32)
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mu), axis=-1, keepdims=True)
    y = (x - mu) * jax.lax.rsqrt(var + eps_ref[0])
    y = y * g_ref[:].astype(jnp.float32) + b_ref[:].astype(jnp.float32)
    ax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(ax, 1e-8) / 127.0
    q_ref[:] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    s_ref[:] = s


def _gelu_quant_kernel(x_ref, q_ref, s_ref):
    y = _gelu_tanh(x_ref[:].astype(jnp.float32))
    ax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(ax, 1e-8) / 127.0
    q_ref[:] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    s_ref[:] = s


def _ident_quant_kernel(x_ref, q_ref, s_ref):
    y = x_ref[:].astype(jnp.float32)
    ax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(ax, 1e-8) / 127.0
    q_ref[:] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    s_ref[:] = s


def _rms_quant_kernel(x_ref, g_ref, eps_ref, q_ref, s_ref):
    x = x_ref[:].astype(jnp.float32)
    y = x * jax.lax.rsqrt(
        jnp.mean(jnp.square(x), axis=-1, keepdims=True) + eps_ref[0]
    )
    y = y * g_ref[:].astype(jnp.float32)
    ax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(ax, 1e-8) / 127.0
    q_ref[:] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    s_ref[:] = s


def _silu_mul_quant_kernel(h1_ref, h3_ref, q_ref, s_ref):
    h1 = h1_ref[:].astype(jnp.float32)
    y = h1 * jax.lax.logistic(h1) * h3_ref[:].astype(jnp.float32)
    ax = jnp.max(jnp.abs(y), axis=-1, keepdims=True)
    s = jnp.maximum(ax, 1e-8) / 127.0
    q_ref[:] = jnp.clip(jnp.round(y / s), -127, 127).astype(jnp.int8)
    s_ref[:] = s


def _ln_quant_2d(x2, gamma, beta, eps, block_rows: int):
    r, c = x2.shape
    grid = (pl.cdiv(r, block_rows),)
    q, s = pl.pallas_call(
        _ln_quant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), jnp.int8),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
    )(x2, gamma.reshape(1, c), beta.reshape(1, c), eps)
    return q, s


def _gelu_quant_2d(x2, block_rows: int):
    r, c = x2.shape
    grid = (pl.cdiv(r, block_rows),)
    q, s = pl.pallas_call(
        _gelu_quant_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, c), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), jnp.int8),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
    )(x2)
    return q, s


def _rms_quant_2d(x2, gamma, eps, block_rows: int):
    r, c = x2.shape
    grid = (pl.cdiv(r, block_rows),)
    q, s = pl.pallas_call(
        _rms_quant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), jnp.int8),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
    )(x2, gamma.reshape(1, c), eps)
    return q, s


def _silu_mul_quant_2d(h1, h3, block_rows: int):
    r, c = h1.shape
    grid = (pl.cdiv(r, block_rows),)
    q, s = pl.pallas_call(
        _silu_mul_quant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), jnp.int8),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
    )(h1, h3)
    return q, s


def _ident_quant_2d(x2, block_rows: int):
    r, c = x2.shape
    grid = (pl.cdiv(r, block_rows),)
    q, s = pl.pallas_call(
        _ident_quant_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block_rows, c), lambda i: (i, 0))],
        out_specs=[
            pl.BlockSpec((block_rows, c), lambda i: (i, 0)),
            pl.BlockSpec((block_rows, 1), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, c), jnp.int8),
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
        ],
    )(x2)
    return q, s


def _pick_block_rows(r: int, c: int) -> int:
    # keep the fp32 working tile well under VMEM: rows*c*4B <= ~4 MB,
    # rows a multiple of 8 (sublane). r need NOT divide evenly: the grids
    # use pl.cdiv and Pallas masks the trailing block's stores (each row is
    # independent, so garbage in the padded rows never lands in HBM) —
    # LLM prefill rows are B*S with S odd (e.g. 4*2113), ViT rows are
    # B*1032.
    # budget: the fp32 working tile <= 1 MB. Mosaic keeps several fp32
    # temporaries live (x, normalized, |y|, y/s) plus double-buffered
    # input/output blocks: a 4 MB tile measured 18.9 MB of scoped VMEM
    # (OOM at the 16 MB limit); 1 MB keeps the whole working set ~5 MB
    target = max(8, (1 * 2**20) // (4 * c))
    rows = min(max(r, 8), 1 << (target.bit_length() - 1), 1024)
    return max(8, rows - rows % 8)


def layernorm_quant(x, gamma, beta, eps: float = 1e-6):
    """LayerNorm over the last dim, then per-row int8 quantization.

    Returns (q int8 [..., C], scale fp32 [..., 1]); one HBM read of x
    instead of the norm's read+write plus the quantizer's two passes."""
    c = x.shape[-1]
    r = 1
    for d in x.shape[:-1]:
        r *= d
    rows = _pick_block_rows(r, c) if _on_tpu() else 0
    if not rows or c % 128:
        return _layernorm_quant_xla(x, gamma, beta, eps)
    q, s = _ln_quant_2d(
        x.reshape(r, c), gamma, beta,
        jnp.asarray([eps], jnp.float32), rows,
    )
    return q.reshape(x.shape), s.reshape(x.shape[:-1] + (1,))


def gelu_quant(x):
    """tanh-GELU then per-row int8 quantization (fc1 -> fc2 feed)."""
    c = x.shape[-1]
    r = 1
    for d in x.shape[:-1]:
        r *= d
    rows = _pick_block_rows(r, c) if _on_tpu() else 0
    if not rows or c % 128:
        return _gelu_quant_xla(x)
    q, s = _gelu_quant_2d(x.reshape(r, c), rows)
    return q.reshape(x.shape), s.reshape(x.shape[:-1] + (1,))


def rmsnorm_quant(x, gamma, eps: float = 1e-5):
    """RMSNorm over the last dim, then per-row int8 quantization (the
    attention_norm/ffn_norm -> wqkv/w13 feeds in the decoder)."""
    c = x.shape[-1]
    r = 1
    for d in x.shape[:-1]:
        r *= d
    rows = _pick_block_rows(r, c) if _on_tpu() else 0
    if not rows or c % 128:
        return _rmsnorm_quant_xla(x, gamma, eps)
    q, s = _rms_quant_2d(
        x.reshape(r, c), gamma, jnp.asarray([eps], jnp.float32), rows
    )
    return q.reshape(x.shape), s.reshape(x.shape[:-1] + (1,))


def quant_rows(x):
    """Per-row int8 quantize in ONE HBM read (identity producer).

    For activations whose producer is a Pallas call (the flash-attention
    output feeding wo/proj): the producer can't fuse the quantize into its
    own epilogue (per-token scales need the full H*D row, which is split
    across head programs), so this replaces `ops/w8a8.quantize_rows`'s
    two XLA passes with one."""
    c = x.shape[-1]
    r = 1
    for d in x.shape[:-1]:
        r *= d
    rows = _pick_block_rows(r, c) if _on_tpu() else 0
    if not rows or c % 128:
        from aigv_assessor_tpu.ops.w8a8 import quantize_rows

        return quantize_rows(x)
    q, s = _ident_quant_2d(x.reshape(r, c), rows)
    return q.reshape(x.shape), s.reshape(x.shape[:-1] + (1,))


def silu_mul_quant(h1, h3):
    """silu(h1) * h3 then per-row int8 quantization (SwiGLU -> w2 feed)."""
    assert h1.shape == h3.shape, (h1.shape, h3.shape)
    c = h1.shape[-1]
    r = 1
    for d in h1.shape[:-1]:
        r *= d
    rows = _pick_block_rows(r, c) if _on_tpu() else 0
    # two live input blocks -> halve the row block to stay in VMEM budget,
    # re-rounding to the sublane multiple _pick_block_rows enforces
    if rows > 8:
        rows = max(8, (rows // 2) - (rows // 2) % 8)
    if not rows or c % 128:
        return _silu_mul_quant_xla(h1, h3)
    q, s = _silu_mul_quant_2d(h1.reshape(r, c), h3.reshape(r, c), rows)
    return q.reshape(h1.shape), s.reshape(h1.shape[:-1] + (1,))

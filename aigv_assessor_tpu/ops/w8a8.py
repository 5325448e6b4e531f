"""W8A8 dense ops: int8 x int8 -> int32 on the MXU via plain XLA.

v5e's MXU runs int8 matmuls at ~2x the bf16 rate, and XLA lowers
`lax.dot_general(int8, int8, preferred_element_type=int32)` natively —
measured 330-375 TOPS with the full fp32 scaling epilogue on the scoring
pipeline's prefill/ViT shapes vs 190-197 TFLOP/s bf16 (1.7-2.0x;
benchmarks/int8_xla_probe.py, round 4). Mosaic/Pallas, by contrast,
EMULATES int8 matmuls on this toolchain (29 GB/s, refuted round 3) — so
this path deliberately stays in XLA.

Recipe: weights per-output-channel symmetric int8 (the existing
tools/convert_to_int8.py export: `kernel_int8` [K, N] + `kernel_scale`
[N]); activations quantized ON THE FLY per token (per-row absmax over the
contraction dim, fp32 scales). The epilogue applies both scales in fp32
and casts to the compute dtype. Rel err per matmul ~0.5-1%; end-to-end
score drift is asserted small in tests/test_w8a8.py and measured in
bench.py.

The reference's int8 story is bitsandbytes `load_in_8bit`
(`/root/reference/internvl/model/__init__.py:32-44`) — a CUDA
footprint/throughput feature this replaces with TPU-native MXU compute.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def quantize_rows(x: jnp.ndarray, axis=-1):
    """Per-row symmetric int8 quantization along `axis` (fp32 scales).

    Returns (xq int8, sx fp32) with sx shaped like x reduced over `axis`
    (keepdims)."""
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=axis, keepdims=True)
    sx = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


def _as_quantized(x):
    """Accept either a float activation or a pre-quantized (xq, sx) pair
    (produced by `ops/quant_fuse` fused producer+quantize kernels)."""
    if isinstance(x, tuple):
        xq, sx = x
        assert xq.dtype == jnp.int8, xq.dtype
        return xq, sx
    return quantize_rows(x)


def w8a8_matmul(
    x: jnp.ndarray,  # [..., K] float
    kernel_int8: jnp.ndarray,  # [K, N] int8
    kernel_scale: jnp.ndarray,  # [N] fp32
    bias: Optional[jnp.ndarray] = None,  # [N]
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """y = dequant(quant_rows(x) @ kernel_int8) — standard layout.

    `x` may be a pre-quantized (xq int8, sx fp32) pair from a fused
    producer+quantize kernel (`ops/quant_fuse`)."""
    xq, sx = _as_quantized(x)
    acc = jax.lax.dot_general(
        xq,
        kernel_int8,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * sx * kernel_scale.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)


def w8a8_dynamic_matmul(
    x: jnp.ndarray,  # [..., K] float
    kernel: jnp.ndarray,  # [K, N] float
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """int8 MXU matmul with BOTH sides quantized on the fly.

    For frozen float weights that aren't part of the int8 checkpoint format
    (the SlowFast pointwise convs): the per-out-channel weight quantization
    runs inside the jit, but it's one pass over [K, N] — negligible against
    the [rows, K] activation pass, and XLA hoists it out of any scan."""
    kf = kernel.astype(jnp.float32)
    aw = jnp.max(jnp.abs(kf), axis=0, keepdims=True)
    sw = jnp.maximum(aw, 1e-8) / 127.0
    wq = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)
    xq, sx = quantize_rows(x)
    acc = jax.lax.dot_general(
        xq,
        wq,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * sx * sw).astype(out_dtype)


def w8a8_head_major(
    x: jnp.ndarray,  # [B, S, C] float
    kernel_int8: jnp.ndarray,  # [C, heads*D] int8
    kernel_scale: jnp.ndarray,  # [heads*D] fp32
    heads: int,
    bias: Optional[jnp.ndarray] = None,  # [heads*D]
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Head-major projection [B, S, C] -> [B, heads, S, D] with the
    transpose fused into the matmul output (see lora._HeadMajorDense).
    `x` may be a pre-quantized (xq, sx) pair."""
    xq, sx = _as_quantized(x)  # sx [B, S, 1]
    c = xq.shape[-1]
    d = kernel_int8.shape[-1] // heads
    w = kernel_int8.reshape(c, heads, d)
    acc = jnp.einsum(
        "bsc,chd->bhsd", xq, w, preferred_element_type=jnp.int32
    )
    sw = kernel_scale.astype(jnp.float32).reshape(1, heads, 1, d)
    y = acc.astype(jnp.float32) * sx[:, None, :, :] * sw
    if bias is not None:
        y = y + bias.astype(jnp.float32).reshape(1, heads, 1, d)
    return y.astype(out_dtype)


def w8a8_head_major_in(
    x: jnp.ndarray,  # [B, H, S, D] float
    kernel_int8: jnp.ndarray,  # [H*D, N] int8
    kernel_scale: jnp.ndarray,  # [N] fp32
    bias: Optional[jnp.ndarray] = None,  # [N]
    out_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Out-projection consuming head-major input: [B, H, S, D] -> [B, S, N]."""
    b, h, s, d = x.shape
    xf = x.astype(jnp.float32)
    ax = jnp.max(jnp.abs(xf), axis=(1, 3), keepdims=True)  # [B, 1, S, 1]
    sx = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    w = kernel_int8.reshape(h, d, kernel_int8.shape[-1])
    acc = jnp.einsum(
        "bhsd,hdc->bsc", xq, w, preferred_element_type=jnp.int32
    )
    y = (
        acc.astype(jnp.float32)
        * sx[:, 0, :, :]
        * kernel_scale.astype(jnp.float32)
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(out_dtype)

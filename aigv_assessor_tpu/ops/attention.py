"""Attention dispatch: Pallas flash-attention on TPU, XLA reference elsewhere.

TPU-native replacement for the CUDA flash-attn dependency
(`/root/reference/internvl/model/internvl_chat/flash_attention.py:15-76` for
the ViT; `modeling_internlm2.py:444-614` FlashAttention2 for the decoder).
Instead of cu_seqlens/varlen packing, fixed shapes + masks are used (the
pipeline pads to a static sequence length anyway, `dataset.py:637`).

Layout: q [B, Sq, Hq, D], k/v [B, Skv, Hkv, D] with Hq % Hkv == 0 (GQA).
The XLA path never materializes repeated K/V heads: queries are grouped as
[B, S, Hkv, G, D] and contracted against the shared KV head, which is also
what the Pallas kernel does on-chip.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30


def _on_tpu() -> bool:
    """True on real TPU backends, including the 'axon' tunneled PJRT plugin
    (whose backend name is not 'tpu' but whose devices are TPU chips)."""
    try:
        if jax.default_backend() == "tpu":
            return True
        dev = jax.devices()[0]
        return "tpu" in getattr(dev, "device_kind", "").lower()
    except Exception:  # pragma: no cover
        return False


def xla_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Reference attention; fp32 softmax like the reference
    (`modeling_internlm2.py:424` upcasts attn weights to float32)."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    assert hq % hkv == 0, (hq, hkv)
    g = hq // hkv
    scale = scale if scale is not None else d**-0.5

    qg = q.reshape(b, sq, hkv, g, d)
    # [B, Hkv, G, Sq, Skv]
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    )
    logits = logits * scale

    if causal:
        # query i attends to kv j where j <= i + (Skv - Sq) (decode offset)
        qi = jnp.arange(sq)[:, None] + (skv - sq)
        kj = jnp.arange(skv)[None, :]
        causal_mask = kj <= qi  # [Sq, Skv]
        logits = jnp.where(causal_mask[None, None, None], logits, _NEG_INF)
    if mask is not None:
        if mask.dtype == jnp.bool_:
            m = mask[:, :, None] if mask.ndim == 4 else mask[:, None, None, :, :]
            logits = jnp.where(m, logits, _NEG_INF)
        else:
            m = mask[:, :, None] if mask.ndim == 4 else mask[:, None, None, :, :]
            logits = logits + m.astype(jnp.float32)

    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhgqk,bkhd->bqhgd", probs.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return out.reshape(b, sq, hq, d).astype(q.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "impl")
)
def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Multi-head (optionally grouped-query) attention.

    mask: optional bool (True = attend) or additive-float tensor, shaped
    [B, Sq, Skv] or [B, H, Sq, Skv].
    impl: 'pallas' | 'xla' | None (auto: pallas on TPU when shapes allow).
    """
    use_pallas = impl == "pallas" or (impl is None and _on_tpu())
    if use_pallas:
        from aigv_assessor_tpu.ops import pallas_attention

        if pallas_attention.supported(q, k, v, mask):
            return pallas_attention.flash_attention(
                q, k, v, causal=causal, mask=mask, scale=scale
            )
        if impl == "pallas":
            raise ValueError(
                f"pallas flash attention unsupported for shapes q={q.shape} "
                f"k={k.shape} mask={None if mask is None else mask.shape}"
            )
    return xla_attention(q, k, v, causal=causal, mask=mask, scale=scale)

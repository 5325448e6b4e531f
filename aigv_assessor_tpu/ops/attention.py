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


# NOTE deliberately NOT jax.jit-wrapped: models call this inside their own
# jit, and a nested jit is a fusion boundary — it forced the [B,S,H,D] ->
# [B*H,S,D] relayout around the pallas kernel to materialize instead of
# fusing into the qkv/out projections (measured +3.7 ms/layer on the ViT
# at bs=64; BENCH_NOTES.md).
def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    impl: Optional[str] = None,
    layout: str = "bshd",
    kv_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Multi-head (optionally grouped-query) attention.

    mask: optional bool (True = attend) or additive-float tensor, shaped
    [B, Sq, Skv] or [B, H, Sq, Skv].
    impl: 'pallas' | 'xla' | None (auto: pallas on TPU when shapes allow).
    layout: 'bshd' ([B,S,H,D]) or 'bhsd' ([B,H,S,D], relayout-free from a
    head-major projection). kv_valid: static count of real kv tokens when
    the caller pre-padded S (trailing tokens masked).
    """
    if layout == "bhsd":
        q4 = q.transpose(0, 2, 1, 3)
        k4 = k.transpose(0, 2, 1, 3)
        v4 = v.transpose(0, 2, 1, 3)
    else:
        q4, k4, v4 = q, k, v
    use_pallas = impl == "pallas" or (impl is None and _on_tpu())
    if use_pallas:
        from aigv_assessor_tpu.ops import pallas_attention

        if pallas_attention.supported(q4, k4, v4, mask):
            return pallas_attention.flash_attention(
                q, k, v, causal=causal, mask=mask, scale=scale,
                layout=layout, kv_valid=kv_valid,
            )
        if impl == "pallas":
            raise ValueError(
                f"pallas flash attention unsupported for shapes q={q.shape} "
                f"k={k.shape} mask={None if mask is None else mask.shape}"
            )
    if kv_valid is not None and kv_valid < k4.shape[1]:
        assert mask is None, "kv_valid composes with mask only on the pallas path"
        m = jnp.arange(k4.shape[1]) < kv_valid
        mask = jnp.broadcast_to(
            m[None, None, :], (q4.shape[0], q4.shape[1], k4.shape[1])
        )
    out = xla_attention(q4, k4, v4, causal=causal, mask=mask, scale=scale)
    return out.transpose(0, 2, 1, 3) if layout == "bhsd" else out


def fused_qkv_attention(
    qkv: jnp.ndarray,  # [B, hq + 2*hkv, S, D] head-major, [q | k | v]
    hq: int,
    hkv: int,
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    kv_valid: Optional[int] = None,
    impl: Optional[str] = None,
) -> jnp.ndarray:
    """Attention straight off a fused head-major qkv projection. On the
    pallas path q/k/v are BlockSpec views of the one array (no slice
    copies); fallbacks slice."""
    d = qkv.shape[-1]
    s = qkv.shape[2]
    use_pallas = impl == "pallas" or (impl is None and _on_tpu())
    if (
        use_pallas
        and mask is None
        and (d % 128 == 0 or d == 64)
        and s >= 8
        and hq % hkv == 0
    ):
        from aigv_assessor_tpu.ops import pallas_attention

        return pallas_attention.flash_attention_qkv(
            qkv, hq, hkv, causal=causal, kv_valid=kv_valid
        )
    q = qkv[:, :hq]
    k = qkv[:, hq : hq + hkv]
    v = qkv[:, hq + hkv :]
    return multi_head_attention(
        q, k, v, causal=causal, mask=mask, layout="bhsd", kv_valid=kv_valid,
        impl=impl,
    )

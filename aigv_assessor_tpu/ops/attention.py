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
    (whose backend name is not 'tpu' but whose devices are TPU chips).

    Honors a `jax.default_device(...)` override: host-side param
    materialization (cli/common.build_serving_stack) traces the model for
    the CPU device while the default BACKEND is still the TPU — Pallas
    kernels must not be selected for that trace."""
    try:
        dev = getattr(jax.config, "jax_default_device", None)
        if isinstance(dev, str):
            # jax.default_device also accepts platform strings
            return dev.lower() == "tpu"
        if dev is None:
            if jax.default_backend() == "tpu":
                return True
            dev = jax.devices()[0]
        return (
            dev.platform == "tpu"
            or "tpu" in getattr(dev, "device_kind", "").lower()
        )
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
        if mask.ndim == 4:
            # per-head mask [B, Hq, Sq, Skv]: regroup to the grouped-query
            # layout so it broadcasts against logits [B, Hkv, G, Sq, Skv]
            m = mask.reshape(b, hkv, g, sq, skv)
        else:
            m = mask[:, None, None, :, :]
        if mask.dtype == jnp.bool_:
            logits = jnp.where(m, logits, _NEG_INF)
        else:
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
    # the causal kernel assumes self-attention geometry; causal with
    # sq != skv (decode offset) is an XLA-path feature
    causal_cross = causal and q4.shape[1] != k4.shape[1]
    if use_pallas and not causal_cross:
        from aigv_assessor_tpu.ops import pallas_attention

        if pallas_attention.supported(q4, k4, v4, mask):
            return pallas_attention.flash_attention(
                q, k, v, causal=causal, mask=mask, scale=scale,
                layout=layout, kv_valid=kv_valid,
            )
    if impl == "pallas":
        raise ValueError(
            f"pallas flash attention unsupported for shapes q={q.shape} "
            f"k={k.shape} causal={causal} "
            f"mask={None if mask is None else mask.shape}"
        )
    if kv_valid is not None and kv_valid < k4.shape[1]:
        assert mask is None, "kv_valid composes with mask only on the pallas path"
        m = jnp.arange(k4.shape[1]) < kv_valid
        mask = jnp.broadcast_to(
            m[None, None, :], (q4.shape[0], q4.shape[1], k4.shape[1])
        )
    out = xla_attention(q4, k4, v4, causal=causal, mask=mask, scale=scale)
    return out.transpose(0, 2, 1, 3) if layout == "bhsd" else out


def two_part_cached_attention(
    q: jnp.ndarray,  # [B, S, Hq, D] (current block, rope applied)
    k: jnp.ndarray,  # [B, S, Hkv, D] (current block, rope applied)
    v: jnp.ndarray,  # [B, S, Hkv, D]
    cache_k,  # [B, max_len, Hkv, D] (read-only) or (int8 data, fp32 scale)
    cache_v,
    cache_index: jnp.ndarray,  # scalar int32: valid cache rows
    kv_mask: Optional[jnp.ndarray] = None,  # [B, max_len] bool
    block_causal: Optional[int] = None,
) -> jnp.ndarray:
    """Decode/prefill attention over (read-only old cache) + (current block)
    with one softmax spanning both.

    `block_causal=g`: the current block is G = s/g INDEPENDENT groups of g
    rows each — causal within a group, no attention across groups (every
    group still attends the full cache). This serves the shared-prefix
    perspective scorer: P perspective suffixes ride one sequence axis
    against ONE prefix KV cache instead of P tiled cache copies.

    The cache is never copied here — the CALLER writes the new k/v rows at
    [cache_index, cache_index + s). The naive formulation (update the full
    [B, max_len, Hkv, d] slice per layer and re-emit it) costs ~400 MB of
    pure HBM copy per decode token at 2B scale under `nn.scan`, because
    scanned *outputs* are not aliased while scan *carries* are
    (BENCH_NOTES.md decode section). Replaces the reference's FA2 varlen
    decode path (`modeling_internlm2.py:444-614`).

    int8 cache (`ops/kv_quant.py`): cache_k/cache_v arrive as
    `(int8 [B, max_len, Hkv, d], fp32 [B, max_len, Hkv])` tuples. The int8
    data feeds the dots directly (half the HBM bytes of bf16); the K scale
    multiplies the LOGITS per kv position/head, and the V scale folds into
    the softmax probabilities before the PV dot, so no dequantized copy of
    the cache ever materializes. The current block's k/v stay unquantized.
    """
    from aigv_assessor_tpu.ops.kv_quant import is_quantized

    k_scale = v_scale = None
    if is_quantized(cache_k):
        cache_k, k_scale = cache_k
        cache_v, v_scale = cache_v
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    g = hq // hkv
    scale = d**-0.5
    qg = q.reshape(b, s, hkv, g, d)
    neg = jnp.float32(-1e30)

    lo = jnp.einsum(
        "bqhgd,bkhd->bhgqk",
        qg,
        cache_k.astype(qg.dtype) if k_scale is not None else cache_k,
        preferred_element_type=jnp.float32,
    ) * scale  # [B, Hkv, G, s, max_len]
    if k_scale is not None:
        lo = lo * k_scale.transpose(0, 2, 1)[:, :, None, None, :]
    slots = jnp.arange(cache_k.shape[1])
    # slots are fill-ordered: everything before cache_index is past
    valid_old = slots[None, :] < cache_index
    if kv_mask is not None:
        # left-padded prompts: padded cache slots are never attended
        valid_old = valid_old & kv_mask
    else:
        valid_old = jnp.broadcast_to(valid_old, (b, slots.shape[0]))
    lo = jnp.where(valid_old[:, None, None, None, :], lo, neg)

    ln = jnp.einsum(
        "bqhgd,bkhd->bhgqk", qg, k, preferred_element_type=jnp.float32
    ) * scale  # [B, Hkv, G, s, s]
    rows = jnp.arange(s)
    valid_new = rows[None, :] <= rows[:, None]  # causal
    if block_causal is not None:
        valid_new = valid_new & (
            (rows[:, None] // block_causal) == (rows[None, :] // block_causal)
        )
    valid_new = valid_new[None]
    if kv_mask is not None:
        # left-padded prefill: pad columns inside the current block
        # (slots [cache_index, cache_index+s)) are masked too
        blk = jax.lax.dynamic_slice_in_dim(kv_mask, cache_index, s, axis=1)
        valid_new = valid_new & blk[:, None, :]
    ln = jnp.where(valid_new[:, None, None], ln, neg)

    m = jnp.maximum(
        jnp.max(lo, axis=-1, keepdims=True),
        jnp.max(ln, axis=-1, keepdims=True),
    )
    po = jnp.exp(lo - m)
    pn = jnp.exp(ln - m)
    denom = po.sum(-1, keepdims=True) + pn.sum(-1, keepdims=True)
    po = po / denom
    if v_scale is not None:
        # fold the per-(position, head) V scale into the probabilities so
        # the PV contraction consumes the int8 cache directly
        po = po * v_scale.transpose(0, 2, 1)[:, :, None, None, :]
        po = po.astype(v.dtype)
        cache_v = cache_v.astype(v.dtype)
    else:
        po = po.astype(cache_v.dtype)
    pn = (pn / denom).astype(v.dtype)
    ctx = jnp.einsum(
        "bhgqk,bkhd->bqhgd", po, cache_v, preferred_element_type=jnp.float32
    ) + jnp.einsum(
        "bhgqk,bkhd->bqhgd", pn, v, preferred_element_type=jnp.float32
    )
    return ctx.reshape(b, s, hq, d).astype(q.dtype)


def fused_qkv_attention(
    qkv: jnp.ndarray,  # [B, hq + 2*hkv, S, D] head-major, [q | k | v]
    hq: int,
    hkv: int,
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    kv_valid: Optional[int] = None,
    impl: Optional[str] = None,
    out_layout: str = "bhsd",
) -> jnp.ndarray:
    """Attention straight off a fused head-major qkv projection. On the
    pallas path q/k/v are BlockSpec views of the one array (no slice
    copies); fallbacks slice. out_layout='bsd' returns [B, S, hq*D] — the
    kernel writes the out-projection's dense input form so wo/proj ride the
    dense int8 MXU path under W8A8 (inference-only)."""
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

        dense = (
            out_layout == "bsd"
            and pallas_attention.dense_out_supported(
                hq, hkv, d, qkv.shape[1]
            )
        )
        out = pallas_attention.flash_attention_qkv(
            qkv, hq, hkv, causal=causal, kv_valid=kv_valid,
            out_layout="bsd" if dense else "bhsd",
        )
        if out_layout == "bsd" and not dense:
            b, h, ss, dd = out.shape
            out = out.transpose(0, 2, 1, 3).reshape(b, ss, h * dd)
        return out
    q = qkv[:, :hq]
    k = qkv[:, hq : hq + hkv]
    v = qkv[:, hq + hkv :]
    out = multi_head_attention(
        q, k, v, causal=causal, mask=mask, layout="bhsd", kv_valid=kv_valid,
        impl=impl,
    )
    if out_layout == "bsd":
        b, h, ss, dd = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, ss, h * dd)
    return out

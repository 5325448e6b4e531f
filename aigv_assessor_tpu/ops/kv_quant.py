"""int8 KV-cache quantization.

At batched decode the per-sample cache read is the second HBM bandwidth
term after the (batch-amortized) weight stream: at the 2B serving shape
(L=24, Hkv=8, d=128, seq 2161) the bf16 cache is ~212 MB/sample and every
decoded token reads all of it. Storing the cache as int8 with one fp32
scale per (position, kv-head) halves those bytes — and halves cache HBM
footprint, which is what bounds batch size / context length for 7B-class
serving on a 16 GB chip.

Quantization is symmetric per (batch, position, kv-head) over the head_dim
values: K rows are RoPE'd (bounded, zero-mean-ish) and V rows are raw
projections — both quantize well at this granularity (the standard KV-int8
recipe in TPU/GPU serving stacks). The current step's own k/v rows take
part in attention UNQUANTIZED (`two_part_cached_attention`'s "new" part);
only rows read back from the cache on later steps see the rounding.

A quantized cache is represented as a `(int8_data, fp32_scale)` tuple
wherever a bf16 cache array would appear ([..., S, Hkv, d] data with a
[..., S, Hkv] scale) — pytrees thread the tuple through scan carries and
`KVCache` fields with no signature changes.

The reference has no counterpart (HF fp16 `past_key_values`,
`modeling_internlm2.py:395-400`); this is serving-side headroom.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def is_quantized(cache_part) -> bool:
    """True if a cache k/v slot holds an (int8 data, scale) tuple."""
    return isinstance(cache_part, tuple)


def quantize_kv_rows(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., S, Hkv, d] float -> (int8 [..., S, Hkv, d], fp32 [..., S, Hkv]).

    Symmetric absmax over the trailing head_dim; zero rows get scale 1 so
    the stored zeros decode to exact zeros.
    """
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    q = jnp.round(x.astype(jnp.float32) / scale[..., None])
    q = jnp.clip(q, -127, 127).astype(jnp.int8)
    return q, scale


def dequantize_kv_rows(q: jnp.ndarray, scale: jnp.ndarray, dtype=jnp.float32):
    """Inverse of `quantize_kv_rows` (tests / fallback paths)."""
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


def make_cache_rows(k, v, cache_k, cache_v):
    """The new k/v rows an attention layer hands back for the caller to
    write into the cache: quantized when the cache is, cast to the cache
    dtype otherwise. Shared by both decoder backbones."""
    if is_quantized(cache_k):
        return quantize_kv_rows(k), quantize_kv_rows(v)
    return k.astype(cache_k.dtype), v.astype(cache_v.dtype)

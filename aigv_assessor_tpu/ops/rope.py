"""Rotary position embeddings with dynamic-NTK scaling.

Functional TPU-friendly port of the reference rotary classes
(`/root/reference/internvl/model/internlm2/modeling_internlm2.py:161-245`):
instead of a stateful, growing cos/sin cache (which would break jit's static
shapes), the table is computed for a static `seq_len` at trace time. The
dynamic-NTK base adjustment (`InternLM2DynamicNTKScalingRotaryEmbedding.
_set_cos_sin_cache`, lines 218-245) is a pure function of the static length,
so re-jitting per sequence-length bucket reproduces the reference semantics
exactly.

Layout note: the reference uses the "rotate_half" convention (first half /
second half of head_dim, lines 246-252), NOT interleaved even/odd pairs. We
keep that convention so converted checkpoints are bit-compatible.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np


def ntk_scaled_base(
    base: float,
    dim: int,
    seq_len: int,
    max_position_embeddings: int,
    scaling_factor: float,
) -> float:
    """Dynamic-NTK base; reference `modeling_internlm2.py:230-236`."""
    if seq_len <= max_position_embeddings:
        return base
    return base * (
        (scaling_factor * seq_len / max_position_embeddings) - (scaling_factor - 1)
    ) ** (dim / (dim - 2))


def rope_cos_sin(
    seq_len: int,
    dim: int,
    base: float = 1_000_000.0,
    scaling_type: Optional[str] = "dynamic",
    scaling_factor: float = 2.0,
    max_position_embeddings: int = 32768,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build [seq_len, dim] cos/sin tables (freqs duplicated across halves,
    reference `emb = cat((freqs, freqs))`, `modeling_internlm2.py:181-184`)."""
    if scaling_type == "dynamic":
        base = ntk_scaled_base(base, dim, seq_len, max_position_embeddings, scaling_factor)
    inv_freq = 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))
    t = np.arange(seq_len, dtype=np.float32)
    if scaling_type == "linear":
        t = t / scaling_factor
    freqs = np.outer(t, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return jnp.asarray(np.cos(emb), dtype), jnp.asarray(np.sin(emb), dtype)


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(
    q: jnp.ndarray,
    k: jnp.ndarray,
    cos: jnp.ndarray,
    sin: jnp.ndarray,
    position_ids: jnp.ndarray,
    layout: str = "bshd",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply RoPE to q/k of shape [B, S, H, D] ('bshd') or [B, H, S, D]
    ('bhsd'); position_ids [B, S].

    Equivalent to reference `apply_rotary_pos_emb`
    (`modeling_internlm2.py:255-261`); 'bhsd' matches the reference layout.
    """
    # [B, S, D] -> broadcast over heads
    if layout == "bhsd":
        cos_g = jnp.take(cos, position_ids, axis=0)[:, None, :, :]
        sin_g = jnp.take(sin, position_ids, axis=0)[:, None, :, :]
    else:
        cos_g = jnp.take(cos, position_ids, axis=0)[:, :, None, :]
        sin_g = jnp.take(sin, position_ids, axis=0)[:, :, None, :]
    cos_g = cos_g.astype(q.dtype)
    sin_g = sin_g.astype(q.dtype)
    q_rot = q * cos_g + rotate_half(q) * sin_g
    k_rot = k * cos_g + rotate_half(k) * sin_g
    return q_rot, k_rot

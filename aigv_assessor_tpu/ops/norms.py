"""Normalization ops.

TPU-native equivalent of apex FusedRMSNorm
(`/root/reference/internvl/patch/llama_rmsnorm_monkey_patch.py:4-17`,
`modeling_intern_vit.py:46-57`): on TPU, XLA fuses the reduction +
rsqrt + scale chain into the surrounding elementwise graph automatically, so a
hand-written kernel buys nothing for these shapes — the win is keeping the
statistics in fp32 while inputs stay bf16, exactly like the reference
(`modeling_internlm2.py:128-143` upcasts to float32 then casts back).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """RMSNorm with fp32 statistics; returns x's dtype.

    Matches `InternLM2RMSNorm.forward` (`modeling_internlm2.py:128-143`):
    variance over the last dim, no mean subtraction, weight applied after the
    cast back to the input dtype.
    """
    input_dtype = x.dtype
    xf = x.astype(jnp.float32)
    variance = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * lax.rsqrt(variance + eps)
    return weight.astype(input_dtype) * xf.astype(input_dtype)


def layer_norm(
    x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-6
) -> jnp.ndarray:
    """LayerNorm with fp32 statistics (ViT norm_type='layer_norm',
    `config.json:163`)."""
    input_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    xf = (xf - mean) * lax.rsqrt(var + eps)
    return (xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)).astype(
        input_dtype
    )

"""Hand-rolled LoRA for Flax Dense layers.

TPU-native replacement for peft's adapter injection used by the reference
(`/root/reference/internvl/model/internvl_chat_stage2_lora/modeling_internvl_chat.py:276-306`):
instead of monkey-patching module trees, model code instantiates `LoRADense`
where the reference targets adapters —

- ViT: attn.qkv, attn.proj, mlp.fc1, mlp.fc2 (`wrap_backbone_lora`)
- InternLM2: attention.wqkv, attention.wo, feed_forward.w1/w2/w3
  (`wrap_llm_lora`)

with alpha = 2r, dropout 0.05. The base kernel lives under `.../base` so
frozen-base + trainable-adapter masks are a pure path filter, and merge
(`tools/merge_lora.py`) is `W + (alpha/r) * A @ B` like peft's
`merge_and_unload`.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from aigv_assessor_tpu.core.config import LoRAConfig  # noqa: F401  (re-export)


class Int8Dense(nn.Module):
    """Dense over per-channel-symmetric int8 weights (W8A16 serving).

    Param names match tools/convert_to_int8.py's export (`kernel_int8` +
    `kernel_scale` replacing `kernel`), so an int8 checkpoint loads directly.
    Replaces the reference's bitsandbytes `load_in_8bit` path
    (`/root/reference/internvl/model/__init__.py:32-44`)."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from aigv_assessor_tpu.ops.int8_matmul import int8_dense_apply

        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel_int8", nn.initializers.zeros, (in_dim, self.features),
            jnp.int8,
        )
        scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        y = int8_dense_apply(x.astype(self.dtype), kernel, scale,
                             out_dtype=self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y


class LoRADense(nn.Module):
    features: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    lora: Optional[LoRAConfig] = None
    int8: bool = False  # W8A16 serving base (Int8Dense)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.int8:
            y = Int8Dense(
                self.features, use_bias=self.use_bias, dtype=self.dtype,
                name="base",
            )(x)
        else:
            y = nn.Dense(
                self.features,
                use_bias=self.use_bias,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                name="base",
            )(x)
        if self.lora is not None and self.lora.r > 0:
            r = self.lora.r
            in_dim = x.shape[-1]
            lora_a = self.param(
                "lora_a",
                nn.initializers.variance_scaling(1.0 / r, "fan_in", "uniform"),
                (in_dim, r),
                jnp.float32,
            )
            lora_b = self.param(
                "lora_b", nn.initializers.zeros, (r, self.features), jnp.float32
            )
            h = x
            if not deterministic and self.lora.dropout > 0.0:
                h = nn.Dropout(self.lora.dropout)(h, deterministic=False)
            delta = (h.astype(self.dtype) @ lora_a.astype(self.dtype)) @ lora_b.astype(
                self.dtype
            )
            y = y + delta * self.lora.scaling
        return y


def is_lora_param_path(path: tuple) -> bool:
    """True for LoRA adapter leaves (path tuple of str keys)."""
    return any(str(p) in ("lora_a", "lora_b") for p in path)

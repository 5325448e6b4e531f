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


class LoRADense(nn.Module):
    features: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
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

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


class Int4Dense(nn.Module):
    """Dense over nibble-packed int4 weights (W4A16 serving).

    Param names match `tools/convert_to_int8.py --bits 4` (`kernel_int4`
    [ceil(K/2), N] + `kernel_scale4` [N]); the matmul unpacks in-kernel
    (`ops/int8_matmul.int4_matmul`), streaming 4 bits/weight from HBM —
    the reference's bitsandbytes `load_in_4bit` counterpart
    (`/root/reference/internvl/model/__init__.py:32-44`)."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        from aigv_assessor_tpu.ops.int8_matmul import int4_dense_apply

        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel_int4", nn.initializers.zeros,
            ((in_dim + 1) // 2, self.features), jnp.int8,
        )
        scale = self.param(
            "kernel_scale4", nn.initializers.ones, (self.features,), jnp.float32
        )
        y = int4_dense_apply(
            x.astype(self.dtype), kernel, scale, out_dtype=self.dtype
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype)
        return y


class W8A8Dense(nn.Module):
    """Dense over per-channel int8 weights with on-the-fly per-token int8
    activation quantization — int8 x int8 on the MXU at ~1.8x the bf16 rate
    (`ops/w8a8.py`). Same param names/format as Int8Dense, so int8
    checkpoints serve either W8A16 (bandwidth) or W8A8 (compute)."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16
    # head-major fusion modes, mirroring _HeadMajorDense/_HeadMajorOutDense
    head_major: Optional[int] = None
    head_major_in: bool = False

    @nn.compact
    def __call__(self, x):
        from aigv_assessor_tpu.ops import w8a8 as ops

        # x may be a pre-quantized (xq int8, sx fp32) pair from a fused
        # producer+quantize kernel (`ops/quant_fuse`)
        xs = x[0] if isinstance(x, tuple) else x
        in_dim = (
            xs.shape[1] * xs.shape[3] if self.head_major_in else xs.shape[-1]
        )
        kernel = self.param(
            "kernel_int8", nn.initializers.zeros, (in_dim, self.features),
            jnp.int8,
        )
        scale = self.param(
            "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        if self.head_major:
            return ops.w8a8_head_major(
                x, kernel, scale, self.head_major, bias=bias,
                out_dtype=self.dtype,
            )
        if self.head_major_in:
            return ops.w8a8_head_major_in(
                x, kernel, scale, bias=bias, out_dtype=self.dtype
            )
        return ops.w8a8_matmul(x, kernel, scale, bias=bias, out_dtype=self.dtype)


class _HeadMajorDense(nn.Module):
    """Dense whose output is emitted head-major [B, heads, S, D] straight
    from the projection einsum ('bsc,chd->bhsd') — XLA fuses the transpose
    into the matmul output, so the flash kernel's [B*H, S, D] layout needs
    no relayout copy (measured ~5 ms/layer saved on the ViT at bs=64,
    BENCH_NOTES.md). Param names/shapes identical to nn.Dense."""

    features: int
    heads: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # [B, S, C] -> [B, heads, S, D]
        c = x.shape[-1]
        d = self.features // self.heads
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (c, self.features),
            jnp.float32,
        )
        w = kernel.astype(self.dtype).reshape(c, self.heads, d)
        y = jnp.einsum("bsc,chd->bhsd", x.astype(self.dtype), w)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(y.dtype).reshape(1, self.heads, 1, d)
        return y


class _HeadMajorOutDense(nn.Module):
    """Dense consuming a head-major [B, heads, S, D] input -> [B, S, C]
    (the inverse fusion for the attention out-projection)."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):  # [B, H, S, D] -> [B, S, features]
        _, h, _, d = x.shape
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (h * d, self.features),
            jnp.float32,
        )
        w = kernel.astype(self.dtype).reshape(h, d, self.features)
        y = jnp.einsum("bhsd,hdc->bsc", x.astype(self.dtype), w)
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
    int4: bool = False  # W4A16 serving base (Int4Dense)
    w8a8: bool = False  # int8 MXU compute base (W8A8Dense)
    # head-major fusion modes (mutually exclusive): `head_major` emits
    # [B, heads, S, D]; `head_major_in` consumes that layout
    head_major: Optional[int] = None
    head_major_in: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        quant = self.int8 or self.int4
        if isinstance(x, tuple):
            # pre-quantized input: only the W8A8 base can consume it, and
            # the LoRA branch cannot (adapters need the float activation);
            # callers fuse the quantizer only when adapters are merged
            assert self.w8a8 and (self.lora is None or self.lora.r == 0)
        if self.w8a8:
            assert not quant, "w8a8 excludes int8/int4 weight streaming"
            y = W8A8Dense(
                self.features, use_bias=self.use_bias, dtype=self.dtype,
                head_major=self.head_major, head_major_in=self.head_major_in,
                name="base",
            )(x)
        elif self.head_major:
            assert not quant, "quantized + head_major not supported"
            y = _HeadMajorDense(
                self.features, self.head_major, use_bias=self.use_bias,
                dtype=self.dtype, name="base",
            )(x)
        elif self.head_major_in:
            assert not quant, "quantized + head_major not supported"
            y = _HeadMajorOutDense(
                self.features, use_bias=self.use_bias, dtype=self.dtype,
                name="base",
            )(x)
        elif self.int4:
            y = Int4Dense(
                self.features, use_bias=self.use_bias, dtype=self.dtype,
                name="base",
            )(x)
        elif self.int8:
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
            in_dim = (
                x.shape[1] * x.shape[3] if self.head_major_in else x.shape[-1]
            )
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
            h = h.astype(self.dtype)
            a = lora_a.astype(self.dtype)
            b_ = lora_b.astype(self.dtype)
            if self.head_major_in:
                hh, d = x.shape[1], x.shape[3]
                xa = jnp.einsum("bhsd,hdr->bsr", h, a.reshape(hh, d, r))
                delta = xa @ b_
            elif self.head_major:
                d = self.features // self.head_major
                xa = h @ a  # [B, S, r]
                delta = jnp.einsum(
                    "bsr,rhd->bhsd", xa, b_.reshape(r, self.head_major, d)
                )
            else:
                delta = (h @ a) @ b_
            y = y + delta * self.lora.scaling
        return y


def is_lora_param_path(path: tuple) -> bool:
    """True for LoRA adapter leaves (path tuple of str keys)."""
    return any(str(p) in ("lora_a", "lora_b") for p in path)

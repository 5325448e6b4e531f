"""Phi-3 decoder (alternative LLM backbone), first-class like InternLM2.

Behavioral port of `/root/reference/internvl/model/phi3/modeling_phi3.py`
(selectable in the composite model via `llm_config.architectures`, reference
`configuration_internvl_chat.py:56-63` and `wrap_llm_lora` targets
`mlp.down_proj, mlp.gate_up_proj, self_attn.o_proj, self_attn.qkv_proj`):

- fused, NON-interleaved qkv_proj (plain [q | k | v] concat — unlike
  InternLM2's interleaved wqkv), fused gate_up_proj ([gate | up]);
- RMSNorm, SwiGLU (silu(gate) * up -> down_proj);
- RoPE with optional 'su'/'longrope' scaling: separate short/long inv-freq
  factor tables and the sqrt(1 + log(s)/log(orig_max)) attention scaling
  (reference Phi3SuScaledRotaryEmbedding).

TPU-first structure (shared with the InternLM2 module):
- scan-over-layers (`apply_decoder_layers`): one traced layer, params
  stacked [L, ...], compile time O(1) in depth; the KV cache rides the scan
  CARRY so decode writes only the new rows in place (no per-layer
  full-cache copy — the bug class measured at ~400 MB/token in
  BENCH_NOTES.md).
- head-major fused-qkv fast path for the no-cache forward (projection emits
  [B, H, S, D]; the Pallas flash kernel reads q/k/v as BlockSpec views).
- two-part cached attention (read-only cache + current block, one softmax).
- optional per-layer remat (reference `--grad_checkpoint`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.core.config import LoRAConfig
from aigv_assessor_tpu.models.internlm2 import (
    KVCache,
    RMSNorm,
    apply_decoder_layers,
)
from aigv_assessor_tpu.models.lora import LoRADense
from aigv_assessor_tpu.ops.attention import (
    fused_qkv_attention,
    multi_head_attention,
    two_part_cached_attention,
)
from aigv_assessor_tpu.ops.rope import apply_rope


def _filter(cls, d):
    import dataclasses

    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in d.items() if k in names}


@dataclass(frozen=True)
class Phi3Config:
    architecture: str = "Phi3ForCausalLM"
    vocab_size: int = 32064
    hidden_size: int = 3072
    intermediate_size: int = 8192
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    hidden_act: str = "silu"
    max_position_embeddings: int = 131072
    original_max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-5
    rope_theta: float = 10000.0
    rope_scaling_type: Optional[str] = None  # 'su' | 'longrope' | None
    rope_short_factor: Optional[Tuple[float, ...]] = None
    rope_long_factor: Optional[Tuple[float, ...]] = None
    tie_word_embeddings: bool = False
    bos_token_id: int = 1
    eos_token_id: int = 32000
    pad_token_id: int = 32000
    # scan-over-layers (see LLMConfig.scan_layers): stacked [L, ...] params,
    # one traced layer, cache on the scan carry
    scan_layers: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_dict(cls, d) -> "Phi3Config":
        d = dict(d)
        if d.get("architectures"):
            d["architecture"] = d["architectures"][0]
        rs = d.get("rope_scaling")
        if isinstance(rs, dict):
            d["rope_scaling_type"] = rs.get("type")
            if rs.get("short_factor"):
                d["rope_short_factor"] = tuple(rs["short_factor"])
            if rs.get("long_factor"):
                d["rope_long_factor"] = tuple(rs["long_factor"])
        return cls(**_filter(cls, d))

    @classmethod
    def tiny(cls) -> "Phi3Config":
        return cls(
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=4,
            max_position_embeddings=4096,
            original_max_position_embeddings=2048,
        )


def phi3_rope_tables(cfg: Phi3Config, seq_len: int, dtype=jnp.float32):
    """cos/sin with su/longrope factor tables + attention scaling
    (reference Phi3SuScaledRotaryEmbedding)."""
    dim = cfg.head_dim
    inv_freq = 1.0 / (
        cfg.rope_theta ** (np.arange(0, dim, 2, dtype=np.float32) / dim)
    )
    scale_mult = 1.0
    if cfg.rope_scaling_type in ("su", "longrope"):
        if seq_len > cfg.original_max_position_embeddings and cfg.rope_long_factor:
            factors = np.asarray(cfg.rope_long_factor, np.float32)
        elif cfg.rope_short_factor:
            factors = np.asarray(cfg.rope_short_factor, np.float32)
        else:
            factors = np.ones_like(inv_freq)
        inv_freq = inv_freq / factors
        scale = cfg.max_position_embeddings / cfg.original_max_position_embeddings
        if scale > 1.0:
            scale_mult = float(
                np.sqrt(
                    1.0
                    + np.log(scale) / np.log(cfg.original_max_position_embeddings)
                )
            )
    t = np.arange(seq_len, dtype=np.float32)
    freqs = np.outer(t, inv_freq)
    emb = np.concatenate([freqs, freqs], axis=-1)
    return (
        jnp.asarray(np.cos(emb) * scale_mult, dtype),
        jnp.asarray(np.sin(emb) * scale_mult, dtype),
    )


class Phi3Attention(nn.Module):
    config: Phi3Config
    precision: Precision
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(
        self, x, cos, sin, position_ids, attention_mask=None,
        cache_k=None, cache_v=None, cache_index=None, kv_mask=None,
        deterministic=True, capture_kv=False, block_causal=None,
    ):
        cfg = self.config
        # x may be a pre-quantized (int8, scale) pair under fused W8A8
        b, s, c = (x[0] if isinstance(x, tuple) else x).shape
        hq, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

        # head-major fast path for the training/scoring forward (no cache):
        # same structure as InternLM2Attention — the projection emits
        # [B, H, S, D] so the flash kernel needs no relayout copy
        fast = (
            cache_k is None
            and not self.precision.int8_weights
            and not self.precision.int4_weights
            and s >= 8
        )
        if fast:
            qkv = LoRADense(
                (hq + 2 * hkv) * d,
                dtype=self.precision.compute_dtype,
                lora=self.lora,
                head_major=hq + 2 * hkv,
                w8a8=self.precision.w8a8,
                name="qkv_proj",
            )(x, deterministic)  # [B, hq+2*hkv, S, d]
            q = qkv[:, :hq]
            k = qkv[:, hq : hq + hkv]
            q, k = apply_rope(q, k, cos, sin, position_ids, layout="bhsd")
            new_cache = (
                (k.transpose(0, 2, 1, 3), qkv[:, hq + hkv :].transpose(0, 2, 1, 3))
                if capture_kv
                else None
            )
            if attention_mask is not None and attention_mask.ndim == 3:
                out = multi_head_attention(
                    q, k, qkv[:, hq + hkv :], causal=True,
                    mask=attention_mask, impl="xla", layout="bhsd",
                )
            else:
                qkv = jnp.concatenate([q, k, qkv[:, hq + hkv :]], axis=1)
                out = fused_qkv_attention(qkv, hq, hkv, causal=True)
            out = LoRADense(
                c, dtype=self.precision.compute_dtype, lora=self.lora,
                head_major_in=True, name="o_proj",
            )(out, deterministic)
            return out, new_cache

        qkv = LoRADense(
            (hq + 2 * hkv) * d,
            dtype=self.precision.compute_dtype,
            lora=self.lora,
            int8=self.precision.int8_weights,
            int4=self.precision.int4_weights,
            w8a8=self.precision.w8a8,
            name="qkv_proj",
        )(x, deterministic)
        q = qkv[..., : hq * d].reshape(b, s, hq, d)
        k = qkv[..., hq * d : (hq + hkv) * d].reshape(b, s, hkv, d)
        v = qkv[..., (hq + hkv) * d :].reshape(b, s, hkv, d)
        q, k = apply_rope(q, k, cos, sin, position_ids)

        new_cache = None
        if cache_k is not None:
            # read-only two-part cached attention; the caller (scan carry)
            # writes the new rows — no per-layer full-cache copy. Single-
            # token decode on TPU uses the Pallas ragged-window kernel.
            from aigv_assessor_tpu.ops.kv_quant import is_quantized, make_cache_rows

            new_cache = make_cache_rows(k, v, cache_k, cache_v)
            from aigv_assessor_tpu.ops.decode_attention import (
                cached_decode_attention,
                decode_kernel_supported,
            )

            if (
                s == 1
                and block_causal is None
                and not is_quantized(cache_k)
                and decode_kernel_supported(hq, hkv, d, b)
            ):
                out = cached_decode_attention(
                    q, k, v, cache_k, cache_v, cache_index, kv_mask
                ).astype(self.precision.compute_dtype)
            else:
                out = two_part_cached_attention(
                    q, k, v, cache_k, cache_v, cache_index, kv_mask,
                    block_causal=block_causal,
                ).astype(self.precision.compute_dtype)
        else:
            if capture_kv:
                new_cache = (k, v)
            if attention_mask is not None and attention_mask.ndim == 3:
                out = multi_head_attention(
                    q, k, v, causal=True, mask=attention_mask, impl="xla"
                )
            else:
                out = multi_head_attention(q, k, v, causal=True)
        out = out.reshape(b, s, hq * d)
        return (
            LoRADense(
                c, dtype=self.precision.compute_dtype, lora=self.lora,
                int8=self.precision.int8_weights,
                int4=self.precision.int4_weights, name="o_proj",
            )(out, deterministic),
            new_cache,
        )


class Phi3MLP(nn.Module):
    config: Phi3Config
    precision: Precision
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.config
        gate_up = LoRADense(
            2 * cfg.intermediate_size,
            dtype=self.precision.compute_dtype,
            lora=self.lora,
            int8=self.precision.int8_weights,
            int4=self.precision.int4_weights,
            w8a8=self.precision.w8a8,
            name="gate_up_proj",
        )(x, deterministic)
        gate, up = jnp.split(gate_up, 2, axis=-1)
        from aigv_assessor_tpu.ops.quant_fuse import fuse_enabled, silu_mul_quant

        if (
            self.precision.w8a8
            and (self.lora is None or self.lora.r == 0)
            and fuse_enabled("llm")
        ):
            # fused SwiGLU+quantize feed for the W8A8 down_proj
            h = silu_mul_quant(gate, up)
        else:
            h = nn.silu(gate) * up
        return LoRADense(
            cfg.hidden_size,
            dtype=self.precision.compute_dtype,
            lora=self.lora,
            int8=self.precision.int8_weights,
            int4=self.precision.int4_weights,
            w8a8=self.precision.w8a8,
            name="down_proj",
        )(h, deterministic)


class Phi3DecoderLayer(nn.Module):
    config: Phi3Config
    precision: Precision
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(
        self, x, cos, sin, position_ids, attention_mask=None,
        cache_k=None, cache_v=None, cache_index=None, kv_mask=None,
        deterministic=True, capture_kv=False, block_causal=None,
    ):
        cfg = self.config
        from aigv_assessor_tpu.ops.quant_fuse import fuse_enabled

        # fused norm+quantize feeds for the W8A8 projections (serving only)
        fuse_quant = (
            self.precision.w8a8
            and (self.lora is None or self.lora.r == 0)
            and fuse_enabled("llm")
        )
        in_norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="input_layernorm")
        attn_out, new_cache = Phi3Attention(
            cfg, self.precision, self.lora, name="self_attn"
        )(
            in_norm(x, quant=True) if fuse_quant else in_norm(x),
            cos, sin, position_ids, attention_mask,
            cache_k, cache_v, cache_index, kv_mask, deterministic,
            capture_kv, block_causal,
        )
        x = x + attn_out
        post_norm = RMSNorm(
            cfg.hidden_size, cfg.rms_norm_eps, name="post_attention_layernorm"
        )
        mlp_out = Phi3MLP(cfg, self.precision, self.lora, name="mlp")(
            post_norm(x, quant=True) if fuse_quant else post_norm(x),
            deterministic,
        )
        return x + mlp_out, new_cache


class Phi3ForCausalLM(nn.Module):
    """Same (logits, hidden, cache) interface as InternLM2ForCausalLM so the
    composite model can swap backbones."""

    config: Phi3Config
    precision: Precision = Precision()
    lora: Optional[LoRAConfig] = None
    # per-layer remat (reference `--grad_checkpoint`)
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.embed_tokens = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=self.precision.compute_dtype,
            param_dtype=jnp.float32,
            name="embed_tokens",
        )
        layer_cls = (
            nn.remat(
                Phi3DecoderLayer, static_argnums=(10, 11, 12), prevent_cse=False
            )
            if self.remat
            else Phi3DecoderLayer
        )
        if cfg.scan_layers:
            # one traced layer with stacked [L, ...] params (see
            # InternLM2ForCausalLM.setup; scan applied in apply_decoder_layers
            # so the KV cache rides the carry)
            self.layers = layer_cls(cfg, self.precision, self.lora, name="layers")
        else:
            self.layers = [
                layer_cls(cfg, self.precision, self.lora, name=f"layers_{i}")
                for i in range(cfg.num_hidden_layers)
            ]
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="norm")
        self.lm_head = nn.Dense(
            cfg.vocab_size,
            use_bias=False,
            dtype=self.precision.compute_dtype,
            param_dtype=jnp.float32,
            name="lm_head",
        )

    def embed(self, input_ids):
        return self.embed_tokens(input_ids)

    def __call__(
        self,
        input_ids=None,
        inputs_embeds=None,
        attention_mask=None,
        position_ids=None,
        cache: Optional[KVCache] = None,
        kv_mask=None,
        deterministic: bool = True,
        rope_len: Optional[int] = None,
        with_logits: bool = True,
        capture_kv: bool = False,
        block_causal: Optional[int] = None,
    ):
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = self.embed_tokens(input_ids)
        b, s, _ = inputs_embeds.shape
        if position_ids is None:
            start = cache.index if cache is not None else 0
            position_ids = start + jnp.arange(s, dtype=jnp.int32)[None, :]
            position_ids = jnp.broadcast_to(position_ids, (b, s))
        if rope_len is None:
            rope_len = s
            if cache is not None:
                # int8 caches hold (data, scale); either way the
                # stacked data is [L, B, max_len, ...]
                from aigv_assessor_tpu.ops.kv_quant import is_quantized

                kd = cache.k[0] if is_quantized(cache.k) else cache.k
                rope_len = kd.shape[2]
        cos, sin = phi3_rope_tables(cfg, rope_len)

        x = inputs_embeds.astype(self.precision.compute_dtype)
        x, new_k, new_v = apply_decoder_layers(
            self.layers, cfg.num_hidden_layers, cfg.scan_layers,
            x, cos, sin, position_ids, attention_mask, cache, kv_mask,
            deterministic, capture_kv, block_causal,
        )
        hidden = self.norm(x)
        logits = (
            self.lm_head(hidden).astype(self.precision.logits_dtype)
            if with_logits
            else None
        )
        new_cache = None
        if cache is not None:
            new_cache = KVCache(k=new_k, v=new_v, index=cache.index + s)
        elif capture_kv:
            new_cache = KVCache(
                k=new_k, v=new_v, index=jnp.asarray(s, jnp.int32)
            )
        return logits, hidden, new_cache

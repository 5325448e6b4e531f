"""InternLM2(.5) decoder, TPU-native.

Behavioral port of `/root/reference/internvl/model/internlm2/modeling_internlm2.py`:
GQA attention with a fused wqkv projection, RoPE with dynamic-NTK scaling
(theta 1e6, factor 2.0 per `config.json:82-86`), SwiGLU FFN (w1/w3/w2,
lines 264-278), RMSNorm, untied fp32 LM head (`output`, fp32 logits at
lines 1095-1096).

TPU-first design notes:
- The reference's fused wqkv uses an *interleaved* `(h, gs, d)` layout
  (lines 375-385). We keep one fused wqkv matmul (a single large MXU op) but
  store it **de-interleaved** as [hidden, (Hq + 2*Hkv) * d] with q-heads
  first, then k, then v; the checkpoint converter de-interleaves once at
  conversion time (SURVEY.md §7 "hard parts").
- No growing KV cache: a fixed-capacity cache [B, max_len, Hkv, d] is
  updated with `lax.dynamic_update_slice` so decode steps re-use one compiled
  program (the reference grows `past_key_values` per step, lines 395-400).
- Attention goes through the flash-attention dispatch; the causal-with-cache
  decode path uses an explicit validity mask instead of varlen packing.
- Position ids default to arange (reference lines 906-911).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from aigv_assessor_tpu.core.config import LLMConfig, LoRAConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.lora import LoRADense
from aigv_assessor_tpu.ops.attention import (
    fused_qkv_attention,
    multi_head_attention,
    two_part_cached_attention,
)
from aigv_assessor_tpu.ops.norms import rms_norm
from aigv_assessor_tpu.ops.rope import apply_rope, rope_cos_sin


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, quant: bool = False):
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        if quant:
            # W8A8 serving: emit (int8, scale) straight from the norm — one
            # HBM read instead of norm write + the quantizer's two passes
            from aigv_assessor_tpu.ops.quant_fuse import rmsnorm_quant

            return rmsnorm_quant(x, weight, self.eps)
        return rms_norm(x, weight, self.eps)


@dataclass
class KVCache:
    """Fixed-capacity KV cache (pytree), stacked over layers.

    k/v are single [L, B, max_len, Hkv, d] arrays: the layer dim scans
    cleanly under `nn.scan` and indexes as `cache.k[i]` in the loop path.

    int8 mode (`quantized=True`, `ops/kv_quant.py`): k/v hold
    `(int8 data, fp32 scale [L, B, max_len, Hkv])` tuples instead — half
    the cache HBM bytes/footprint. Pytrees thread the tuples through the
    scan carry and the decode while-loop unchanged."""

    k: Any  # [L, B, max_len, Hkv, d]
    v: Any
    index: jnp.ndarray  # scalar int32: number of valid positions

    @classmethod
    def init(
        cls,
        config: LLMConfig,
        batch: int,
        max_len: int,
        dtype=jnp.bfloat16,
        quantized: bool = False,
    ):
        shape = (
            config.num_hidden_layers,
            batch,
            max_len,
            config.num_key_value_heads,
            config.head_dim,
        )
        if quantized:
            def kv():
                return (
                    jnp.zeros(shape, jnp.int8),
                    jnp.ones(shape[:-1], jnp.float32),
                )

            return cls(k=kv(), v=kv(), index=jnp.zeros((), jnp.int32))
        return cls(
            k=jnp.zeros(shape, dtype),
            v=jnp.zeros(shape, dtype),
            index=jnp.zeros((), jnp.int32),
        )


jax.tree_util.register_dataclass(
    KVCache, data_fields=["k", "v", "index"], meta_fields=[]
)


class InternLM2Attention(nn.Module):
    config: LLMConfig
    precision: Precision
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, S, C]
        cos: jnp.ndarray,
        sin: jnp.ndarray,
        position_ids: jnp.ndarray,  # [B, S]
        attention_mask: Optional[jnp.ndarray] = None,  # bool [B, S] or [B,Sq,Skv]
        cache_k: Optional[jnp.ndarray] = None,  # [B, max_len, Hkv, d]
        cache_v: Optional[jnp.ndarray] = None,
        cache_index: Optional[jnp.ndarray] = None,
        kv_mask: Optional[jnp.ndarray] = None,  # [B, max_len] bool (pad slots False)
        deterministic: bool = True,
        capture_kv: bool = False,  # no-cache forward also returns roped (k, v)
        block_causal: Optional[int] = None,  # see two_part_cached_attention
    ):
        cfg = self.config
        # x may be a pre-quantized (int8, scale) pair under fused W8A8
        b, s, c = (x[0] if isinstance(x, tuple) else x).shape
        hq, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim

        # head-major fast path for the training/scoring forward (no cache,
        # no int8): the projection emits [B, H, S, D] directly so the flash
        # kernel's layout needs no relayout copy (measured ~5 ms/layer on the
        # ViT; same structure here). Cache and int8 paths keep [B, S, H, D].
        fast = (
            cache_k is None
            and not self.precision.int8_weights
            and not self.precision.int4_weights
            and s >= 8
        )
        if fast:
            qkv = LoRADense(
                (hq + 2 * hkv) * d,
                use_bias=cfg.effective_qkv_bias,
                dtype=self.precision.compute_dtype,
                lora=self.lora,
                head_major=hq + 2 * hkv,
                w8a8=self.precision.w8a8,
                name="wqkv",
            )(x, deterministic)  # [B, hq+2*hkv, S, d]
            q = qkv[:, :hq]
            k = qkv[:, hq : hq + hkv]
            q, k = apply_rope(q, k, cos, sin, position_ids, layout="bhsd")
            # shared-prefix scoring: hand the roped k/v back in cache layout
            # ([B, S, Hkv, d]) so the caller can stack them into a KVCache
            new_cache = (
                (k.transpose(0, 2, 1, 3), qkv[:, hq + hkv :].transpose(0, 2, 1, 3))
                if capture_kv
                else None
            )
            # W8A8: the kernel emits the dense [B, S, Hq*D] layout so wo
            # runs as ONE int8 MXU matmul (~264 TOPS dense vs the 39.8-TOPS
            # poisoned head-major-IN einsum; round-4 BENCH_NOTES). bf16
            # keeps head-major-out + the fused head_major_in wo.
            w8a8_wo = self.precision.w8a8
            if attention_mask is not None and attention_mask.ndim == 3:
                out = multi_head_attention(
                    q, k, qkv[:, hq + hkv :], causal=True,
                    mask=attention_mask, impl="xla", layout="bhsd",
                )
                if w8a8_wo:
                    out = out.transpose(0, 2, 1, 3).reshape(b, s, hq * d)
            else:
                # re-fuse post-rope so the flash kernel reads q/k/v as three
                # views of one array (rope writes q/k anyway; the extra v
                # copy is one fused elementwise pass)
                qkv = jnp.concatenate([q, k, qkv[:, hq + hkv :]], axis=1)
                out = fused_qkv_attention(
                    qkv, hq, hkv, causal=True,
                    out_layout="bsd" if w8a8_wo else "bhsd",
                )
            from aigv_assessor_tpu.ops.quant_fuse import (
                quant_rows,
                quant_rows_enabled,
            )

            if (
                w8a8_wo
                and (self.lora is None or self.lora.r == 0)
                and quant_rows_enabled("llm")
            ):
                # one-pass quantize of the flash output feeding the int8 wo
                # dot (default OFF for the decoder pending the model A/B —
                # Pallas calls under nn.scan broke overlap in round 4)
                out = quant_rows(out)
            out = LoRADense(
                c,
                use_bias=cfg.effective_o_bias,
                dtype=self.precision.compute_dtype,
                lora=self.lora,
                head_major_in=not w8a8_wo,
                w8a8=w8a8_wo,
                name="wo",
            )(out, deterministic)
            return out, new_cache

        qkv = LoRADense(
            (hq + 2 * hkv) * d,
            use_bias=cfg.effective_qkv_bias,
            dtype=self.precision.compute_dtype,
            lora=self.lora,
            int8=self.precision.int8_weights,
            int4=self.precision.int4_weights,
            w8a8=self.precision.w8a8,
            name="wqkv",
        )(x, deterministic)
        q = qkv[..., : hq * d].reshape(b, s, hq, d)
        k = qkv[..., hq * d : (hq + hkv) * d].reshape(b, s, hkv, d)
        v = qkv[..., (hq + hkv) * d :].reshape(b, s, hkv, d)

        q, k = apply_rope(q, k, cos, sin, position_ids)

        new_cache = None
        if cache_k is not None:
            # (read-only old cache) + (current block) with one softmax; the
            # caller writes the returned new rows into the scan carry (see
            # ops/attention.py:two_part_cached_attention for why). Single-
            # token decode on TPU goes through the Pallas kernel, which
            # reads only each sample's valid cache window (ragged batches).
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
                # right-padded training/eval batches: causal mask alone is
                # exact (pad keys are only ever attended by pad queries,
                # whose loss rows are masked) — replaces varlen flash-attn
                out = multi_head_attention(q, k, v, causal=True)

        out = out.reshape(b, s, hq * d)
        out = LoRADense(
            c,
            use_bias=cfg.effective_o_bias,
            dtype=self.precision.compute_dtype,
            lora=self.lora,
            int8=self.precision.int8_weights,
            int4=self.precision.int4_weights,
            w8a8=self.precision.w8a8,
            name="wo",
        )(out, deterministic)
        return out, new_cache


class InternLM2MLP(nn.Module):
    config: LLMConfig
    precision: Precision
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.config
        w1 = LoRADense(
            cfg.intermediate_size, dtype=self.precision.compute_dtype,
            lora=self.lora, int8=self.precision.int8_weights,
            int4=self.precision.int4_weights,
            w8a8=self.precision.w8a8,
            name="w1",
        )(x, deterministic)
        w3 = LoRADense(
            cfg.intermediate_size, dtype=self.precision.compute_dtype,
            lora=self.lora, int8=self.precision.int8_weights,
            int4=self.precision.int4_weights,
            w8a8=self.precision.w8a8,
            name="w3",
        )(x, deterministic)
        from aigv_assessor_tpu.ops.quant_fuse import fuse_enabled, silu_mul_quant

        if (
            self.precision.w8a8
            and (self.lora is None or self.lora.r == 0)
            and fuse_enabled("llm")
        ):
            # fused SwiGLU+quantize: one read of the two 8192-wide halves
            # instead of the silu*mul write + the quantizer's two passes
            h = silu_mul_quant(w1, w3)
        else:
            h = nn.silu(w1) * w3
        return LoRADense(
            cfg.hidden_size, dtype=self.precision.compute_dtype,
            lora=self.lora, int8=self.precision.int8_weights,
            int4=self.precision.int4_weights,
            w8a8=self.precision.w8a8,
            name="w2",
        )(h, deterministic)


class InternLM2DecoderLayer(nn.Module):
    config: LLMConfig
    precision: Precision
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(
        self,
        x,
        cos,
        sin,
        position_ids,
        attention_mask=None,
        cache_k=None,
        cache_v=None,
        cache_index=None,
        kv_mask=None,
        deterministic: bool = True,
        capture_kv: bool = False,
        block_causal=None,
    ):
        cfg = self.config
        from aigv_assessor_tpu.ops.quant_fuse import fuse_enabled

        # fused norm+quantize feeds for the W8A8 projections (serving only:
        # adapters need the float activation, so LoRA keeps the two-op path)
        fuse_quant = (
            self.precision.w8a8
            and (self.lora is None or self.lora.r == 0)
            and fuse_enabled("llm")
        )
        attn_norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="attention_norm")
        attn_out, new_cache = InternLM2Attention(
            cfg, self.precision, self.lora, name="attention"
        )(
            attn_norm(x, quant=True) if fuse_quant else attn_norm(x),
            cos,
            sin,
            position_ids,
            attention_mask,
            cache_k,
            cache_v,
            cache_index,
            kv_mask,
            deterministic,
            capture_kv,
            block_causal,
        )
        x = x + attn_out
        ffn_norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="ffn_norm")
        mlp_out = InternLM2MLP(cfg, self.precision, self.lora, name="feed_forward")(
            ffn_norm(x, quant=True) if fuse_quant else ffn_norm(x),
            deterministic,
        )
        return x + mlp_out, new_cache


def apply_decoder_layers(
    layers,
    num_layers: int,
    scan_layers: bool,
    x,
    cos,
    sin,
    position_ids,
    attention_mask,
    cache: Optional[KVCache],
    kv_mask,
    deterministic: bool,
    capture_kv: bool = False,
    block_causal: Optional[int] = None,
):
    """Run a decoder-layer stack (scan-over-layers or unrolled loop) with the
    KV cache riding the scan CARRY.

    Shared by the InternLM2 and Phi-3 backbones: one traced layer under
    `nn.scan` (compile O(1) in depth), and at decode the cache is updated in
    place on the carry — the layer returns only its NEW k/v rows, written
    back here at [i, :, cache_index, ...]. Returns (x, new_k, new_v).

    `capture_kv` (cache-free forward only): also return the per-layer roped
    k/v stacked [L, B, S, Hkv, d] — under scan these are ordinary stacked
    scan OUTPUTS (one [B, S, Hkv, d] write per layer, no carry aliasing
    needed because nothing is updated in place). Feeds the shared-prefix
    perspective scorer.

    int8 caches hold `(data, scale)` tuples per k/v slot; the index/write
    helpers tree-map over the components (scale arrays are one dim shorter,
    hence the rank-generic start indices).
    """

    def index_layer(c_all, i):
        return jax.tree_util.tree_map(
            lambda a: lax.dynamic_index_in_dim(a, i, 0, keepdims=False), c_all
        )

    def write_rows(c_all, new, i, at):
        # new rows land at [i, :, at, ...]; works for [L,B,max,Hkv,d] data
        # and [L,B,max,Hkv] scales alike
        return jax.tree_util.tree_map(
            lambda a, n: lax.dynamic_update_slice(
                a, n[None].astype(a.dtype), (i, 0, at) + (0,) * (a.ndim - 3)
            ),
            c_all,
            new,
        )

    ci = cache.index if cache is not None else None
    if scan_layers:
        scan_kw = dict(
            variable_axes={"params": 0},
            split_rngs={"params": True, "dropout": True},
            in_axes=0,
            out_axes=0,
            length=num_layers,
        )
        if cache is None:
            def body(layer, carry, i):
                y, kv = layer(
                    carry, cos, sin, position_ids, attention_mask,
                    None, None, None, kv_mask, deterministic,
                    capture_kv, block_causal,
                )
                return y, kv

            x, kv = nn.scan(body, **scan_kw)(layers, x, jnp.arange(num_layers))
            if capture_kv:
                return x, kv[0], kv[1]
            return x, None, None

        def body(layer, carry, i):
            y, ck_all, cv_all = carry
            ck = index_layer(ck_all, i)
            cv = index_layer(cv_all, i)
            y, new = layer(
                y, cos, sin, position_ids, attention_mask,
                ck, cv, ci, kv_mask, deterministic,
                False, block_causal,
            )
            kn, vn = new
            ck_all = write_rows(ck_all, kn, i, ci)
            cv_all = write_rows(cv_all, vn, i, ci)
            return (y, ck_all, cv_all), None

        (x, new_k, new_v), _ = nn.scan(body, **scan_kw)(
            layers, (x, cache.k, cache.v), jnp.arange(num_layers)
        )
        return x, new_k, new_v

    new_k = cache.k if cache is not None else None
    new_v = cache.v if cache is not None else None
    captured = []
    for i, layer in enumerate(layers):
        ck = index_layer(new_k, i) if cache is not None else None
        cv = index_layer(new_v, i) if cache is not None else None
        x, layer_cache = layer(
            x, cos, sin, position_ids, attention_mask, ck, cv, ci,
            kv_mask, deterministic, capture_kv, block_causal,
        )
        if cache is not None and layer_cache is not None:
            kn, vn = layer_cache
            new_k = write_rows(new_k, kn, i, ci)
            new_v = write_rows(new_v, vn, i, ci)
        elif capture_kv:
            captured.append(layer_cache)
    if capture_kv and cache is None:
        new_k = jnp.stack([kv[0] for kv in captured])
        new_v = jnp.stack([kv[1] for kv in captured])
    return x, new_k, new_v


class InternLM2ForCausalLM(nn.Module):
    """Returns (logits fp32, final hidden state, new cache)."""

    config: LLMConfig
    precision: Precision = Precision()
    lora: Optional[LoRAConfig] = None
    # per-layer remat (reference `--grad_checkpoint` ->
    # `_set_gradient_checkpointing`, `stage1_train.py:888-889`)
    remat: bool = False

    def setup(self):
        cfg = self.config
        self.tok_embeddings = nn.Embed(
            cfg.vocab_size,
            cfg.hidden_size,
            dtype=self.precision.compute_dtype,
            param_dtype=jnp.float32,
            name="tok_embeddings",
        )
        layer_cls = (
            # prevent_cse=False: safe under scan/loop and lets XLA fold the
            # recompute into the backward schedule
            nn.remat(
                InternLM2DecoderLayer, static_argnums=(10, 11, 12),
                prevent_cse=False,
            )
            if self.remat
            else InternLM2DecoderLayer
        )
        if cfg.scan_layers:
            # one traced layer, params stacked [L, ...]: compile time is
            # O(1) in depth instead of O(L) (SURVEY §7; 2B forward compile
            # took minutes with the unrolled loop). The scan transform is
            # applied at call time (function-target) so the KV cache can ride
            # the scan CARRY — carries alias in place, scanned outputs do not
            self.layers = layer_cls(cfg, self.precision, self.lora, name="layers")
        else:
            self.layers = [
                layer_cls(cfg, self.precision, self.lora, name=f"layers_{i}")
                for i in range(cfg.num_hidden_layers)
            ]
        self.norm = RMSNorm(cfg.hidden_size, cfg.rms_norm_eps, name="norm")
        # tied embeddings (Qwen2-0.5B/1.5B style): reuse the embedding matrix
        # via Embed.attend instead of a separate head
        if cfg.tie_word_embeddings:
            self.output = None
        elif self.precision.int4_weights:
            from aigv_assessor_tpu.models.lora import Int4Dense

            self.output = Int4Dense(
                cfg.vocab_size,
                use_bias=False,
                dtype=self.precision.compute_dtype,
                name="output",
            )
        elif self.precision.int8_weights:
            from aigv_assessor_tpu.models.lora import Int8Dense

            self.output = Int8Dense(
                cfg.vocab_size,
                use_bias=False,
                dtype=self.precision.compute_dtype,
                name="output",
            )
        else:
            self.output = nn.Dense(
                cfg.vocab_size,
                use_bias=False,
                dtype=self.precision.compute_dtype,
                param_dtype=jnp.float32,
                name="output",
            )

    def embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.tok_embeddings(input_ids)

    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        cache: Optional[KVCache] = None,
        kv_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        rope_len: Optional[int] = None,
        with_logits: bool = True,
        capture_kv: bool = False,
        block_causal: Optional[int] = None,
    ) -> Tuple[Optional[jnp.ndarray], jnp.ndarray, Optional[KVCache]]:
        cfg = self.config
        if inputs_embeds is None:
            inputs_embeds = self.tok_embeddings(input_ids)
        b, s, _ = inputs_embeds.shape

        if position_ids is None:
            start = cache.index if cache is not None else 0
            position_ids = start + jnp.arange(s, dtype=jnp.int32)[None, :]
            position_ids = jnp.broadcast_to(position_ids, (b, s))

        # static rope table length: cache capacity when decoding, else seq len
        if rope_len is None:
            rope_len = s
            if cache is not None:
                # int8 caches hold (data, scale); either way the
                # stacked data is [L, B, max_len, ...]
                from aigv_assessor_tpu.ops.kv_quant import is_quantized

                kd = cache.k[0] if is_quantized(cache.k) else cache.k
                rope_len = kd.shape[2]
        rs = cfg.rope_scaling
        cos, sin = rope_cos_sin(
            rope_len,
            cfg.head_dim,
            base=cfg.rope_theta,
            scaling_type=rs.type if rs else None,
            scaling_factor=rs.factor if rs else 1.0,
            max_position_embeddings=cfg.max_position_embeddings,
        )

        x = inputs_embeds.astype(self.precision.compute_dtype)
        x, new_k, new_v = apply_decoder_layers(
            self.layers, cfg.num_hidden_layers, cfg.scan_layers,
            x, cos, sin, position_ids, attention_mask, cache, kv_mask,
            deterministic, capture_kv, block_causal,
        )

        hidden = self.norm(x)
        # score-only serving skips the [*, vocab] fp32 head entirely: at 2B
        # scale it is ~3.2 TFLOP + a 3.1 GB fp32 HBM write per bs=4 batch
        if not with_logits:
            logits = None
        elif self.output is None:  # tied embeddings
            logits = self.tok_embeddings.attend(
                hidden.astype(self.precision.compute_dtype)
            ).astype(self.precision.logits_dtype)
        else:
            logits = self.output(hidden).astype(self.precision.logits_dtype)

        new_cache = None
        if cache is not None:
            new_cache = KVCache(k=new_k, v=new_v, index=cache.index + s)
        elif capture_kv:
            # captured prefix KV ([L, B, S, Hkv, d]), ready to seed a cache
            new_cache = KVCache(
                k=new_k, v=new_v, index=jnp.asarray(s, jnp.int32)
            )
        return logits, hidden, new_cache


def cross_entropy_loss(
    logits: jnp.ndarray,  # [B, S, V] fp32
    labels: jnp.ndarray,  # [B, S] int32, ignore = -100
    ignore_index: int = -100,
) -> jnp.ndarray:
    """Shifted next-token CE, mean over non-ignored tokens (reference
    `modeling_internvl_chat.py:343-355`)."""
    shift_logits = logits[:, :-1, :]
    shift_labels = labels[:, 1:]
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0)
    logp = jax.nn.log_softmax(shift_logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    count = jnp.maximum(valid.sum(), 1)
    return nll.sum() / count


class InternLM2ForSequenceClassification(nn.Module):
    """Sequence classification head over the decoder (reference
    `modeling_internlm2.py:1325+`): pool the hidden state of the LAST
    non-padding token per sample and project to `num_labels` (untied,
    bias-free like the reference's `score` Linear)."""

    config: LLMConfig
    num_labels: int = 2
    precision: Precision = Precision()
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(
        self,
        input_ids: Optional[jnp.ndarray] = None,
        inputs_embeds: Optional[jnp.ndarray] = None,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        backbone = InternLM2ForCausalLM(
            self.config, self.precision, self.lora, name="model"
        )
        _, hidden, _ = backbone(
            input_ids=input_ids,
            inputs_embeds=inputs_embeds,
            attention_mask=attention_mask,
            position_ids=position_ids,
            deterministic=deterministic,
        )
        if attention_mask is not None:
            last = jnp.sum(attention_mask.astype(jnp.int32), axis=1) - 1
        else:
            last = jnp.full((hidden.shape[0],), hidden.shape[1] - 1, jnp.int32)
        pooled = jnp.take_along_axis(
            hidden, last[:, None, None], axis=1
        )[:, 0, :]
        logits = nn.Dense(
            self.num_labels,
            use_bias=False,
            dtype=self.precision.compute_dtype,
            param_dtype=jnp.float32,
            name="score",
        )(pooled)
        return logits.astype(jnp.float32)

"""InternViT-300M vision encoder, TPU-native.

Re-implements the behavior of the reference encoder
(`/root/reference/internvl/model/internvl_chat/modeling_intern_vit.py`):
patch embedding (Conv 14x14 stride 14), cls token, learned position embedding
with on-the-fly bicubic interpolation (`_get_pos_embed`, lines 87-93), 24
pre-norm layers with LayerScale ls1/ls2 + DropPath (lines 199-228), optional
QK-RMSNorm over the flattened head dim (lines 133-151, 166-169), and
`resize_pos_embeddings` (lines 309-319, provided here as a pure function in
the checkpoint tools).

TPU-first differences from the reference:
- NHWC pixel layout (XLA's native conv layout on TPU) instead of NCHW.
- attention runs through the shared flash-attention dispatch
  (`aigv_assessor_tpu.ops.attention`) -> Pallas kernel on TPU.
- position-embedding interpolation runs *on device* as two constant
  matmuls with torch-exact bicubic weights (`ops/resize.py`), not a
  host-side torch call.
- gradient checkpointing is applied by the trainer via `jax.checkpoint`
  policies on the scan-over-layers, not per-module flags.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from aigv_assessor_tpu.core.config import LoRAConfig, VisionConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.lora import LoRADense
from aigv_assessor_tpu.ops.attention import fused_qkv_attention, multi_head_attention
from aigv_assessor_tpu.ops.norms import layer_norm, rms_norm


class RMSNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        return rms_norm(x, weight, self.eps)


class LayerNorm(nn.Module):
    dim: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x, quant: bool = False):
        weight = self.param("weight", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        if quant:
            # W8A8 serving: emit (int8, scale) straight from the norm — one
            # HBM read instead of norm write + quantizer's two passes
            from aigv_assessor_tpu.ops.quant_fuse import layernorm_quant

            return layernorm_quant(x, weight, bias, self.eps)
        return layer_norm(x, weight, bias, self.eps)


def make_norm(norm_type: str, dim: int, eps: float, name: str):
    if norm_type == "rms_norm":
        return RMSNorm(dim, eps, name=name)
    return LayerNorm(dim, eps, name=name)


def drop_path(
    x: jnp.ndarray, rate, rng: Optional[jax.Array]
) -> jnp.ndarray:
    """Stochastic depth (timm DropPath used at reference
    `modeling_intern_vit.py:213-214`): drop the whole residual branch
    per-sample. `rate` may be a traced scalar (it is scanned over layers)."""
    if rng is None:
        return x
    keep = 1.0 - jnp.asarray(rate, jnp.float32)
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep.astype(x.dtype), 0.0).astype(x.dtype)


class InternVisionEmbeddings(nn.Module):
    config: VisionConfig
    precision: Precision

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        """pixel_values: [B, H, W, 3] (NHWC) -> [B, 1 + H/p*W/p, C]."""
        cfg = self.config
        cls_token = self.param(
            "class_embedding",
            nn.initializers.normal(1.0),
            (1, 1, cfg.hidden_size),
            jnp.float32,
        )
        pos_embed = self.param(
            "position_embedding",
            nn.initializers.normal(1.0),
            (1, cfg.num_patches + 1, cfg.hidden_size),
            jnp.float32,
        )
        patch = nn.Conv(
            features=cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=self.precision.compute_dtype,
            param_dtype=jnp.float32,
            name="patch_embedding",
        )
        x = patch(pixel_values.astype(self.precision.compute_dtype))  # [B,h,w,C]
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        cls = jnp.broadcast_to(cls_token, (b, 1, c)).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)

        # interpolate grid part of the pos embed to (h, w) when the input
        # resolution differs from training resolution; torch-exact bicubic
        # (A=-0.75, align_corners=False) as two constant matmuls, mirroring
        # reference `_get_pos_embed` (`modeling_intern_vit.py:87-93`) —
        # jax.image.resize's bicubic (A=-0.5) drifts ~1e-2 from torch's.
        side = cfg.num_patches_per_side
        grid = pos_embed[:, 1:, :]
        if (h, w) != (side, side):
            from aigv_assessor_tpu.ops.resize import bicubic_resize_grid

            grid = grid.reshape(1, side, side, cfg.hidden_size)
            grid = bicubic_resize_grid(grid, h, w)
            grid = grid.reshape(1, h * w, cfg.hidden_size)
        pos = jnp.concatenate([pos_embed[:, :1, :], grid], axis=1)
        return x + pos.astype(x.dtype)


class InternAttention(nn.Module):
    config: VisionConfig
    precision: Precision
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        deterministic: bool = True,
        kv_valid: Optional[int] = None,  # static: real tokens if x is padded
    ) -> jnp.ndarray:
        cfg = self.config
        # x may be a pre-quantized (int8, scale) pair under fused W8A8
        b, n, c = (x[0] if isinstance(x, tuple) else x).shape
        h, d = cfg.num_attention_heads, cfg.head_dim

        if not cfg.qk_normalization:
            # fast path: head-major projections fuse the [B,S,H,D]->[B,H,S,D]
            # relayout into the matmuls, so the flash kernel sees its native
            # layout with zero copies (~5 ms/layer at bs=64; BENCH_NOTES.md)
            qkv = LoRADense(
                3 * c,
                use_bias=cfg.qkv_bias,
                dtype=self.precision.compute_dtype,
                lora=self.lora,
                head_major=3 * h,
                w8a8=self.precision.w8a8,
                name="qkv",
            )(x, deterministic)  # [B, 3H, N, D]
            # W8A8: the kernel emits [B, N, H*D] so proj rides the dense
            # int8 MXU path (head-major-IN int8 measured 39.8 TOPS, dense
            # ~264; round-4 BENCH_NOTES). bf16 keeps head-major.
            w8a8_proj = self.precision.w8a8
            out = fused_qkv_attention(
                qkv, h, h, causal=False, kv_valid=kv_valid,
                out_layout="bsd" if w8a8_proj else "bhsd",
            )  # [B, H, N, D] or [B, N, H*D]
            from aigv_assessor_tpu.ops.quant_fuse import (
                quant_rows,
                quant_rows_enabled,
            )

            if (
                w8a8_proj
                and (self.lora is None or self.lora.r == 0)
                and quant_rows_enabled("vit")
            ):
                # one-pass per-token quantize of the attention output: the
                # producer is a Pallas call, so XLA can't fuse the absmax +
                # cast passes into it the way it does for norm/gelu feeds
                out = quant_rows(out)
            return LoRADense(
                c,
                use_bias=True,
                dtype=self.precision.compute_dtype,
                lora=self.lora,
                head_major_in=not w8a8_proj,
                w8a8=w8a8_proj,
                name="proj",
            )(out, deterministic)

        qkv = LoRADense(
            3 * c,
            use_bias=cfg.qkv_bias,
            dtype=self.precision.compute_dtype,
            lora=self.lora,
            w8a8=self.precision.w8a8,
            name="qkv",
        )(x, deterministic)
        q, k, v = jnp.split(qkv, 3, axis=-1)  # each [B, N, C]

        # reference normalizes over the *flattened* head dim
        # (`modeling_intern_vit.py:166-169`)
        q = RMSNorm(c, cfg.layer_norm_eps, name="q_norm")(q)
        k = RMSNorm(c, cfg.layer_norm_eps, name="k_norm")(k)

        q = q.reshape(b, n, h, d)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)
        out = multi_head_attention(q, k, v, causal=False, kv_valid=kv_valid)
        out = out.reshape(b, n, c)
        return LoRADense(
            c,
            use_bias=True,
            dtype=self.precision.compute_dtype,
            lora=self.lora,
            w8a8=self.precision.w8a8,
            name="proj",
        )(out, deterministic)


class InternMLP(nn.Module):
    config: VisionConfig
    precision: Precision
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.config
        x = LoRADense(
            cfg.intermediate_size,
            use_bias=True,
            dtype=self.precision.compute_dtype,
            lora=self.lora,
            w8a8=self.precision.w8a8,
            name="fc1",
        )(x, deterministic)
        from aigv_assessor_tpu.ops.quant_fuse import fuse_enabled, gelu_quant

        if (
            self.precision.w8a8
            and (self.lora is None or self.lora.r == 0)
            and cfg.approximate_gelu
            and fuse_enabled("vit")
        ):
            # fused GELU+quantize: one read of the 4096-wide fc1 output
            # instead of gelu write + quantizer's two passes (the single
            # most expensive quantize in the encoder)
            x = gelu_quant(x)
        else:
            x = nn.gelu(x, approximate=cfg.approximate_gelu)
        return LoRADense(
            cfg.hidden_size,
            use_bias=True,
            dtype=self.precision.compute_dtype,
            lora=self.lora,
            w8a8=self.precision.w8a8,
            name="fc2",
        )(x, deterministic)


class InternVisionEncoderLayer(nn.Module):
    config: VisionConfig
    precision: Precision
    lora: Optional[LoRAConfig] = None

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        drop_path_rate,  # python float (loop path) or traced scalar (scanned)
        deterministic: bool = True,
        kv_valid: Optional[int] = None,  # static: real tokens if x is padded
    ) -> jnp.ndarray:
        cfg = self.config
        ls1 = self.param(
            "ls1",
            nn.initializers.constant(cfg.initializer_factor),
            (cfg.hidden_size,),
            jnp.float32,
        )
        ls2 = self.param(
            "ls2",
            nn.initializers.constant(cfg.initializer_factor),
            (cfg.hidden_size,),
            jnp.float32,
        )
        # static gate on the config's max rate; per-layer rate is traced
        use_dp = not deterministic and cfg.drop_path_rate > 0.0
        rng = self.make_rng("dropout") if use_dp else None
        from aigv_assessor_tpu.ops.quant_fuse import fuse_enabled

        # fused norm+quantize feeds for the W8A8 projections (serving only:
        # adapters need the float activation, so LoRA keeps the two-op path)
        fuse_quant = (
            self.precision.w8a8
            and (self.lora is None or self.lora.r == 0)
            and cfg.norm_type != "rms_norm"
            and fuse_enabled("vit")
        )
        norm1 = make_norm(cfg.norm_type, cfg.hidden_size, cfg.layer_norm_eps, "norm1")
        attn_out = InternAttention(cfg, self.precision, self.lora, name="attn")(
            norm1(x, quant=True) if fuse_quant else norm1(x),
            deterministic,
            kv_valid,
        )
        x = x + drop_path(
            attn_out * ls1.astype(attn_out.dtype), drop_path_rate, rng
        )
        rng2 = self.make_rng("dropout") if use_dp else None
        norm2 = make_norm(cfg.norm_type, cfg.hidden_size, cfg.layer_norm_eps, "norm2")
        mlp_out = InternMLP(cfg, self.precision, self.lora, name="mlp")(
            norm2(x, quant=True) if fuse_quant else norm2(x),
            deterministic,
        )
        x = x + drop_path(
            mlp_out * ls2.astype(mlp_out.dtype), drop_path_rate, rng2
        )
        return x


class InternVisionModel(nn.Module):
    """Full encoder; returns the last hidden state [B, 1+P, C] (or the hidden
    state at `select_layer` — `extract_feature` in the composite model selects
    layer -1 by default, reference `modeling_internvl_chat.py:390-401`)."""

    config: VisionConfig
    precision: Precision = Precision()
    lora: Optional[LoRAConfig] = None
    # per-layer rematerialization (reference: ViT grad ckpt default-on,
    # `modeling_intern_vit.py:248,277-280`); applied as nn.remat around each
    # encoder layer so backward recomputes activations layer-by-layer
    remat: bool = False
    # optional jax.checkpoint_policies name (e.g.
    # 'dots_with_no_batch_dims_saveable'): with ViT LoRA adapters the
    # backward needs dL/d(projection outputs); full remat recomputes the
    # whole encoder for them (measured 1.18 s/step vs 0.578 LLM-only,
    # BENCH_NOTES round 3) while saving just the dot outputs avoids most of
    # the recompute for a bounded activation-memory increase
    remat_policy: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        pixel_values: jnp.ndarray,
        deterministic: bool = True,
        select_layer: int = -1,
    ) -> jnp.ndarray:
        cfg = self.config
        x = InternVisionEmbeddings(cfg, self.precision, name="embeddings")(
            pixel_values
        )
        # stochastic-depth decay: linspace(0, drop_path_rate, L)
        # (reference `modeling_intern_vit.py:245`)
        n_layers = cfg.num_hidden_layers
        if select_layer != -1:
            # hidden_states[select_layer] = input to layer `select_layer`,
            # i.e. run `select_layer mod (L+1)` layers
            n_run = select_layer % (n_layers + 1)
        else:
            n_run = n_layers
        if self.remat:
            policy = (
                getattr(jax.checkpoint_policies, self.remat_policy)
                if self.remat_policy
                else None
            )
            layer_cls = nn.remat(
                InternVisionEncoderLayer, static_argnums=(3, 4),
                prevent_cse=False, policy=policy,
            )
        else:
            layer_cls = InternVisionEncoderLayer
        # pad the token dim ONCE for the whole encoder (1025 -> 1032) so the
        # flash kernel's 8-multiple requirement costs no per-layer pad/slice;
        # pad tokens are excluded from attention via kv_valid and sliced off
        # at the end. MLP/norm work on them is 0.7% overhead.
        n_tok = x.shape[1]
        n_pad = (-n_tok) % 8
        kv_valid = n_tok if n_pad else None
        if n_pad:
            x = jnp.pad(x, ((0, 0), (0, n_pad), (0, 0)))
        if n_layers > 1:
            rates = [
                cfg.drop_path_rate * i / (n_layers - 1) for i in range(n_layers)
            ]
        else:
            rates = [cfg.drop_path_rate]
        if cfg.scan_layers:
            # function-target scan: the layer returns a bare hidden state, so
            # wrap it into the (carry, out) contract; deterministic closes
            # over statically. Partial depth (select_layer != -1) still scans
            # the full parameter stack — param layout must not depend on call
            # args — masking the skipped tail layers to identity.
            partial_depth = n_run < n_layers

            def body(layer, carry, xs):
                rate, active = xs
                out = layer(carry, rate, deterministic, kv_valid)
                if partial_depth:
                    out = jnp.where(active, out, carry)
                return out, None

            scanned = nn.scan(
                body,
                variable_axes={"params": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=0,  # (drop_path_rate[L], active[L])
                out_axes=0,
                length=n_layers,
            )
            layer = layer_cls(cfg, self.precision, lora=self.lora, name="layers")
            active = jnp.arange(n_layers) < n_run
            x, _ = scanned(layer, x, (jnp.asarray(rates, jnp.float32), active))
            return x[:, :n_tok]
        for i in range(n_run):
            x = layer_cls(
                cfg, self.precision, lora=self.lora, name=f"layers_{i}"
            )(x, rates[i], deterministic, kv_valid)
        return x[:, :n_tok]

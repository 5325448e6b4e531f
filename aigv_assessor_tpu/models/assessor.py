"""AIGV-Assessor composite model (vision + motion + LLM + heads).

One parameterized model replacing the reference's six near-identical
`InternVLChatModel` packages (SURVEY.md §1): stage-1 (quality-level text, CE
loss — `/root/reference/internvl/model/internvl_chat/modeling_internvl_chat.py:250-370`)
and stage-2 (continuous MOS regression via the `mlpscore` head, L1 loss —
`internvl_chat_stage2_lora/modeling_internvl_chat.py:308-441`) are selected by
`config.stage`; LoRA by `config.use_backbone_lora` / `use_llm_lora`.

Structure (names follow the reference for checkpoint conversion):
- `vision_model`: InternViT (`modeling_intern_vit.py`)
- `mlp1`: LayerNorm(4*C_vit) -> Dense(C_llm) -> GELU -> Dense(C_llm)
  pixel-shuffle projector (`modeling_internvl_chat.py:218-223`)
- `slowfast_model` + `motion_mlp`: SlowFast-R50 (frozen, stop-gradient like
  the reference's perpetual `torch.no_grad`, line 161) and the
  LayerNorm(2304) -> Dense(4096) -> GELU -> Dense(4096) projector
  (lines 224-229)
- `language_model`: InternLM2 decoder
- `mlpscore`: 4096->1024->256->64->16->1 MLP, ReLU after EVERY layer
  including the last (scores are non-negative by construction — reference
  `internvl_chat_stage2_lora:43-95`); reads hidden[-1][:, -4, :]
  (lines 422-426) with a NaN guard.

Behavioral parity points kept deliberately (SURVEY.md §7 "hard parts"):
score read-out at position -4, final-layer ReLU, the motion token occupying
the LAST <IMG_CONTEXT> slot, stage-2 text CE computed but not trained on.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from aigv_assessor_tpu.core.config import AssessorConfig, LoRAConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.internlm2 import (
    InternLM2ForCausalLM,
    KVCache,
    cross_entropy_loss,
)
from aigv_assessor_tpu.models.motion import SlowFastR50
from aigv_assessor_tpu.models.vit import InternVisionModel
from aigv_assessor_tpu.ops.pixel_shuffle import pixel_shuffle
from aigv_assessor_tpu.ops.splice import splice_image_embeds


def _symmetric_uniform(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class ScoreMLP(nn.Module):
    """mlpscore head; ReLU after every layer including the last.

    Weights init U(-0.1, 0.1), zero bias, like the reference
    (`internvl_chat_stage2_lora/modeling_internvl_chat.py:66-80`).
    """

    dims: Tuple[int, ...]
    precision: Precision

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dims):
            x = nn.Dense(
                d,
                dtype=self.precision.compute_dtype,
                param_dtype=jnp.float32,
                kernel_init=_symmetric_uniform(0.1),
                name=f"fc{i + 1}",
            )(x)
            x = nn.relu(x)
        return x


class ProjectorMLP(nn.Module):
    """LayerNorm -> Dense -> GELU -> Dense (mlp1 / motion_mlp shape)."""

    out_dim: int
    precision: Precision

    @nn.compact
    def __call__(self, x):
        ln = nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln"
        )
        x = ln(x.astype(jnp.float32)).astype(self.precision.compute_dtype)
        x = nn.Dense(
            self.out_dim,
            dtype=self.precision.compute_dtype,
            param_dtype=jnp.float32,
            name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(
            self.out_dim,
            dtype=self.precision.compute_dtype,
            param_dtype=jnp.float32,
            name="fc2",
        )(x)


class AIGVAssessor(nn.Module):
    config: AssessorConfig
    precision: Precision = Precision()
    # per-layer activation rematerialization in both towers (reference
    # `--grad_checkpoint` + ViT ckpt default-on, `stage1_train.py:886-889`)
    remat: bool = False
    # selective remat for the vision tower (jax.checkpoint_policies name,
    # e.g. 'dots_with_no_batch_dims_saveable'): ViT-LoRA training pays a
    # full encoder recompute under plain remat (see vit.py); the LLM keeps
    # full per-layer remat either way
    vit_remat_policy: Optional[str] = None

    def setup(self):
        cfg = self.config
        vit_lora = (
            LoRAConfig(
                r=cfg.use_backbone_lora,
                alpha=2 * cfg.use_backbone_lora,
                dropout=cfg.lora_dropout,
            )
            if cfg.use_backbone_lora
            else None
        )
        llm_lora = (
            LoRAConfig(
                r=cfg.use_llm_lora,
                alpha=2 * cfg.use_llm_lora,
                dropout=cfg.lora_dropout,
            )
            if cfg.use_llm_lora
            else None
        )
        self.vision_model = InternVisionModel(
            cfg.vision, self.precision, lora=vit_lora, remat=self.remat,
            remat_policy=self.vit_remat_policy,
            name="vision_model",
        )
        if getattr(cfg.llm, "architecture", "") == "Phi3ForCausalLM":
            from aigv_assessor_tpu.models.phi3 import Phi3ForCausalLM

            self.language_model = Phi3ForCausalLM(
                cfg.llm, self.precision, lora=llm_lora, remat=self.remat,
                name="language_model",
            )
        else:
            self.language_model = InternLM2ForCausalLM(
                cfg.llm, self.precision, lora=llm_lora, remat=self.remat,
                name="language_model",
            )
        self.mlp1 = ProjectorMLP(cfg.llm.hidden_size, self.precision, name="mlp1")
        self.motion_mlp = ProjectorMLP(
            cfg.llm.hidden_size, self.precision, name="motion_mlp"
        )
        self.slowfast_model = SlowFastR50(
            cfg.motion, self.precision, name="slowfast_model"
        )
        if cfg.stage >= 2:
            self.mlpscore = ScoreMLP(
                cfg.score_head_dims, self.precision, name="mlpscore"
            )

    # ------------------------------------------------------------ features --

    def extract_feature(
        self, pixel_values: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """[N_frames, H, W, 3] -> [N_frames, num_image_token, C_llm].

        ViT encode -> drop cls -> pixel shuffle -> mlp1, mirroring
        `extract_feature` (`modeling_internvl_chat.py:390-409`).
        """
        cfg = self.config
        vit_embeds = self.vision_model(
            pixel_values, deterministic=deterministic, select_layer=cfg.select_layer
        )
        vit_embeds = vit_embeds[:, 1:, :]  # drop cls
        n, l, c = vit_embeds.shape
        h = w = int(l**0.5)
        vit_embeds = vit_embeds.reshape(n, h, w, c)
        vit_embeds = pixel_shuffle(
            vit_embeds, scale_factor=cfg.downsample_ratio, ps_version=cfg.ps_version
        )
        vit_embeds = vit_embeds.reshape(n, -1, vit_embeds.shape[-1])
        return self.mlp1(vit_embeds)

    def extract_motion(
        self,
        frames: jnp.ndarray,
        features: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """[B, T, H, W, 3] -> [B, C_llm]; SlowFast under stop_gradient (the
        reference always runs it in no_grad, `modeling_internvl_chat.py:161`).

        `features` short-circuits the SlowFast tower with precomputed
        [B, feature_dim] motion features (offline feature stores, and the
        differential parity tests that inject identical features into this
        model and the reference's torch forward)."""
        feat = self.slowfast_model(frames) if features is None else features
        feat = jax.lax.stop_gradient(feat.astype(self.precision.compute_dtype))
        return self.motion_mlp(feat)

    def embed_multimodal(
        self,
        input_ids: jnp.ndarray,  # [B, N]
        pixel_values: jnp.ndarray,  # [B, T, H, W, 3]
        deterministic: bool = True,
        with_motion: bool = True,
        motion_features: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        b, t = pixel_values.shape[:2]
        frames = pixel_values.reshape((b * t,) + pixel_values.shape[2:])
        vit_embeds = self.extract_feature(frames, deterministic)  # [B*T, tok, C]
        vit_embeds = vit_embeds.reshape(b, -1, vit_embeds.shape[-1])

        input_embeds = self.language_model.embed(input_ids)
        motion_embeds = (
            self.extract_motion(pixel_values, features=motion_features)
            if with_motion
            else None
        )
        return splice_image_embeds(
            input_embeds,
            input_ids,
            vit_embeds,
            cfg.img_context_token_id,
            motion_embeds,
        )

    # ------------------------------------------------------------- forward --

    def __call__(
        self,
        input_ids: jnp.ndarray,  # [B, N]
        pixel_values: jnp.ndarray,  # [B, T, H, W, 3]
        attention_mask: Optional[jnp.ndarray] = None,  # [B, N] (1 = real)
        labels: Optional[jnp.ndarray] = None,  # [B, N], ignore -100
        mos: Optional[jnp.ndarray] = None,  # [B]
        image_flags: Optional[jnp.ndarray] = None,  # accepted for parity; unused
        position_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        with_logits: bool = True,
        motion_features: Optional[jnp.ndarray] = None,  # [B, feat] precomputed
    ) -> Dict[str, jnp.ndarray]:
        """Teacher-forced forward for training and eval.

        Returns {'loss', 'logits', 'score'(stage2), 'ce_loss', 'hidden'}.
        Stage 1 loss = shifted CE (`modeling_internvl_chat.py:343-355`);
        stage 2 loss = L1(score, mos) with the CE computed but NOT part of the
        loss (`internvl_chat_stage2_lora:409-436`).
        """
        cfg = self.config
        input_embeds = self.embed_multimodal(
            input_ids, pixel_values, deterministic, with_motion=True,
            motion_features=motion_features,
        )
        # score-only serving (stage-2 scoring, no labels) can skip the
        # [*, vocab] fp32 LM head — only `hidden` feeds the score read-out
        with_logits = with_logits or labels is not None
        logits, hidden, _ = self.language_model(
            inputs_embeds=input_embeds,
            attention_mask=attention_mask,
            position_ids=position_ids,
            deterministic=deterministic,
            with_logits=with_logits,
        )

        out: Dict[str, jnp.ndarray] = {"hidden": hidden}
        if with_logits:
            out["logits"] = logits
        ce = None
        if labels is not None:
            ce = cross_entropy_loss(logits, labels)
            out["ce_loss"] = ce

        if cfg.stage >= 2:
            # read-out at a fixed position from the end (-4,
            # `internvl_chat_stage2_lora:422-426`). The reference evaluates
            # unpadded bs=1 sequences; with right-padded batches the position
            # is relative to each sample's true length.
            if attention_mask is not None:
                real_len = attention_mask.astype(jnp.int32).sum(axis=1)  # [B]
                idx = real_len + cfg.score_readout_pos  # e.g. len - 4
                idx = jnp.clip(idx, 0, hidden.shape[1] - 1)
                readout = jnp.take_along_axis(
                    hidden, idx[:, None, None], axis=1
                )[:, 0, :]
            else:
                readout = hidden[:, cfg.score_readout_pos, :]
            readout = jnp.nan_to_num(readout, nan=0.0, posinf=1e9, neginf=-1e9)
            score = self.mlpscore(readout)[:, 0].astype(jnp.float32)
            out["score"] = score
            if mos is not None:
                out["loss"] = jnp.mean(jnp.abs(score - mos.astype(jnp.float32)))
            elif ce is not None:
                out["loss"] = ce
        elif ce is not None:
            out["loss"] = ce
        return out

    def score_perspectives(
        self,
        input_ids: jnp.ndarray,  # [B, P, N] — P perspective prompts/video
        pixel_values: jnp.ndarray,  # [B, T, H, W, 3]
        attention_mask: Optional[jnp.ndarray] = None,  # [B, P, N]
        deterministic: bool = True,
        shared_prefix_len: Optional[int] = None,
    ) -> jnp.ndarray:
        """Score P perspective prompts per video off ONE shared frame encode.

        The reference realizes its "4 perspectives" (`README.md:55`) as four
        SEPARATE full eval runs (`shell/train/stage2_train.sh:13`
        `export number=1`; SURVEY §0) — re-encoding the identical 8 frames
        + motion clip each time, although only the question text differs.
        Here the ViT encode + SlowFast motion run once per video (~54 of
        103 ms/video at 2B scale, BENCH_NOTES.md) and the P prompts batch
        through the LLM against the shared embeddings. Returns [B, P] fp32.

        `shared_prefix_len`: the perspectives' prompts also share their first
        `shared_prefix_len` TOKENS (system turn + all image/motion context
        tokens; only the question text after them differs — the score CLI
        computes this split). The LLM prefill over that prefix — the bulk of
        the dense FLOPs (~2080 of ~2113 tokens at the serving shape) — then
        runs ONCE per video, capturing its per-layer KV; the P suffixes ride
        one sequence axis against the shared cache with a block-diagonal
        causal mask (`two_part_cached_attention(block_causal=...)`), so no
        per-perspective cache copies exist. Caller contract: the first
        `shared_prefix_len` tokens are identical across perspectives,
        contain ALL <IMG_CONTEXT> slots, and are unpadded.
        """
        cfg = self.config
        assert cfg.stage >= 2, "perspective scoring needs the stage-2 head"
        b, p, n = input_ids.shape
        t = pixel_values.shape[1]
        frames = pixel_values.reshape((b * t,) + pixel_values.shape[2:])
        vit_embeds = self.extract_feature(frames, deterministic)  # ONCE
        c = vit_embeds.shape[-1]
        vit_embeds = vit_embeds.reshape(b, -1, c)
        motion_embeds = self.extract_motion(pixel_values)  # [B, C] — ONCE

        if shared_prefix_len is not None:
            return self._score_suffixes_on_shared_prefix(
                input_ids, attention_mask, vit_embeds, motion_embeds,
                shared_prefix_len, deterministic,
            )

        ids_flat = input_ids.reshape(b * p, n)
        input_embeds = self.language_model.embed(ids_flat)
        # tile shared embeds across the perspective dim ([B,P,...] -> [B*P,...]);
        # one bounded HBM copy vs P-1 redundant ViT encodes
        vit_tiled = jnp.repeat(vit_embeds, p, axis=0)
        motion_tiled = jnp.repeat(motion_embeds, p, axis=0)
        input_embeds = splice_image_embeds(
            input_embeds,
            ids_flat,
            vit_tiled,
            cfg.img_context_token_id,
            motion_tiled,
        )

        mask_flat = (
            attention_mask.reshape(b * p, n) if attention_mask is not None else None
        )
        _, hidden, _ = self.language_model(
            inputs_embeds=input_embeds,
            attention_mask=mask_flat,
            deterministic=deterministic,
            with_logits=False,  # score-only: skip the fp32 LM head
        )
        if mask_flat is not None:
            real_len = mask_flat.astype(jnp.int32).sum(axis=1)
            idx = jnp.clip(real_len + cfg.score_readout_pos, 0, hidden.shape[1] - 1)
            readout = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0, :]
        else:
            readout = hidden[:, cfg.score_readout_pos, :]
        readout = jnp.nan_to_num(readout, nan=0.0, posinf=1e9, neginf=-1e9)
        score = self.mlpscore(readout)[:, 0].astype(jnp.float32)
        return score.reshape(b, p)

    def _score_suffixes_on_shared_prefix(
        self,
        input_ids: jnp.ndarray,  # [B, P, N]
        attention_mask: Optional[jnp.ndarray],  # [B, P, N]
        vit_embeds: jnp.ndarray,  # [B, tok, C]
        motion_embeds: jnp.ndarray,  # [B, C]
        prefix_len: int,
        deterministic: bool,
    ) -> jnp.ndarray:
        """Shared-prefix perspective scoring (see score_perspectives)."""
        cfg = self.config
        b, p, n = input_ids.shape
        s_suf = n - prefix_len
        assert s_suf >= -cfg.score_readout_pos, (
            "suffix too short for the score read-out position"
        )

        # 1) prefill the common prefix ONCE per video, capturing roped K/V
        prefix_ids = input_ids[:, 0, :prefix_len]  # identical across P
        prefix_embeds = self.language_model.embed(prefix_ids)
        prefix_embeds = splice_image_embeds(
            prefix_embeds, prefix_ids, vit_embeds,
            cfg.img_context_token_id, motion_embeds,
        )
        # BOTH passes must build their rotary tables from the same length:
        # the suffix pass derives rope_len from its cache CAPACITY
        # (prefix_len + p*s_suf), and scaled-rope variants (dynamic-NTK,
        # Phi-3 su/longrope) change the frequency tables with the table
        # length — a capture pass defaulting to rope_len=prefix_len would
        # rope the cached keys with different frequencies than the suffix
        # queries once the capacity crosses the scaling threshold.
        rope_len = prefix_len + p * s_suf
        _, _, kv = self.language_model(
            inputs_embeds=prefix_embeds,
            deterministic=deterministic,
            with_logits=False,
            capture_kv=True,
            rope_len=rope_len,
        )  # kv.k/v: [L, B, prefix_len, Hkv, d]

        # 2) the P suffixes ride one sequence axis ([B, P*s_suf]) against the
        # shared cache: block-diagonal causal among themselves, full
        # attention to the prefix. Cache capacity covers the suffix rows the
        # layer loop writes back (written at [prefix_len, ...), never read —
        # valid "old" slots stop at index=prefix_len).
        pad = [(0, 0), (0, 0), (0, p * s_suf), (0, 0), (0, 0)]
        cache = KVCache(
            k=jnp.pad(kv.k, pad),
            v=jnp.pad(kv.v, pad),
            index=jnp.asarray(prefix_len, jnp.int32),
        )
        suffix_ids = input_ids[:, :, prefix_len:].reshape(b, p * s_suf)
        suffix_embeds = self.language_model.embed(suffix_ids)
        pos = prefix_len + jnp.tile(jnp.arange(s_suf, dtype=jnp.int32), p)
        pos = jnp.broadcast_to(pos[None], (b, p * s_suf))
        _, hidden, _ = self.language_model(
            inputs_embeds=suffix_embeds,
            position_ids=pos,
            cache=cache,
            deterministic=deterministic,
            with_logits=False,
            block_causal=s_suf,
        )  # [B, P*s_suf, C]

        # 3) read-out at each perspective's (real suffix length - 4)
        if attention_mask is not None:
            real = attention_mask[:, :, prefix_len:].astype(jnp.int32).sum(2)
        else:
            real = jnp.full((b, p), s_suf, jnp.int32)
        idx = jnp.arange(p, dtype=jnp.int32)[None] * s_suf + jnp.clip(
            real + cfg.score_readout_pos, 0, s_suf - 1
        )
        readout = jnp.take_along_axis(hidden, idx[:, :, None], axis=1)  # [B,P,C]
        readout = jnp.nan_to_num(readout, nan=0.0, posinf=1e9, neginf=-1e9)
        return self.mlpscore(readout)[:, :, 0].astype(jnp.float32)

    # ------------------------------------------------------------ decoding --

    def embed_tokens(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        return self.language_model.embed(input_ids)

    def prefill(
        self,
        input_embeds: jnp.ndarray,
        cache: KVCache,
        attention_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
        kv_mask: Optional[jnp.ndarray] = None,
    ):
        """Run the prompt through the LLM, filling the KV cache."""
        return self.language_model(
            inputs_embeds=input_embeds,
            attention_mask=attention_mask,
            position_ids=position_ids,
            cache=cache,
            kv_mask=kv_mask,
        )

    def decode_step(
        self,
        token_ids: jnp.ndarray,
        cache: KVCache,
        kv_mask: Optional[jnp.ndarray] = None,
        position_ids: Optional[jnp.ndarray] = None,
    ):
        """One autoregressive step; token_ids [B, 1]."""
        return self.language_model(
            input_ids=token_ids,
            cache=cache,
            kv_mask=kv_mask,
            position_ids=position_ids,
        )

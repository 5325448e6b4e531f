"""Differential parity: the FULL composite forward vs the reference's own
torch code.

Loads the reference's actual `InternVLChatModel` — stage-1
(`internvl/model/internvl_chat/modeling_internvl_chat.py:250-370`, CE loss)
and stage-2 (`internvl_chat_stage2_lora/modeling_internvl_chat.py:308-441`,
L1 score loss + hidden[-4] read-out) — on a tiny config, converts its
random-initialized state dict through tools/convert_weights, injects
IDENTICAL motion features into both sides (pytorchvideo is not in this
image; the reference's `slowfast` wrapper class is replaced by a
deterministic feature source), and requires loss/score parity <= 2e-4.

Two reference hard-codings are bridged, with the real math untouched:
- `InternVLChatConfig.__init__` re-loads configs from a hard-coded abs path
  (`configuration_internvl_chat.py:43-46`) -> served via
  `fake_hardcoded_config`.
- `motion_mlp`/`mlpscore` hard-code 2304/4096 dims
  (`modeling_internvl_chat.py:224-229`, `MLP()` at :257) -> rebuilt with
  the SAME structure at the tiny config's dims on the torch side (our
  model sizes them from config).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from aigv_assessor_tpu.core.config import AssessorConfig, LLMConfig, VisionConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.assessor import AIGVAssessor
from aigv_assessor_tpu.tools.convert_weights import convert

if not os.path.isdir("/root/reference"):  # pragma: no cover
    pytest.skip("reference tree not mounted", allow_module_level=True)

from tests._ref_oracle import (
    fake_hardcoded_config,
    import_reference_module,
    patch_distributed_rank,
    torch_sd_to_numpy,
)

FP32 = Precision.fp32()

IMG_ID = 120
B, T, FMOT, H_LLM = 2, 4, 16, 64

VISION = dict(
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    image_size=448,  # the reference forward hard-codes view(B, T, 3, 448, 448)
    patch_size=32,  # 14x14 grid -> 49 tokens/frame after 0.5 pixel shuffle
)
LLM = dict(
    vocab_size=128,
    hidden_size=H_LLM,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=512,
    rope_theta=10000.0,
    rms_norm_eps=1e-5,
)


def _config_payload():
    return {
        "llm_config": {
            **LLM,
            "architectures": ["InternLM2ForCausalLM"],
            "bias": False,
            "rope_scaling": None,
            "attn_implementation": "eager",
            "tie_word_embeddings": False,
        },
        "vision_config": {
            **VISION,
            "qkv_bias": True,
            "qk_normalization": False,
            "norm_type": "layer_norm",
            "hidden_act": "gelu",
            "drop_path_rate": 0.0,
            "use_flash_attn": False,
        },
    }


def _motion_features():
    return np.random.default_rng(7).normal(size=(B, FMOT)).astype(np.float32)


def _make_fake_slowfast(feat: np.ndarray):
    import torch

    class FakeSlowfast(torch.nn.Module):
        """Stands in for the reference's pytorchvideo-backed `slowfast`
        wrapper; emits the fixed features the test injects into our model
        via `motion_features` (shape contract [B, F, 1, 1, 1],
        `modeling_internvl_chat.py:193`)."""

        def forward(self, inputs):
            b = inputs[0].shape[0]
            return torch.from_numpy(feat[:b]).reshape(b, -1, 1, 1, 1)

    return FakeSlowfast


def _build_reference(pkg: str, feat: np.ndarray, stage2: bool):
    import torch

    mod = import_reference_module(f"internvl.model.{pkg}.modeling_internvl_chat")
    cfg_mod = import_reference_module(
        f"internvl.model.{pkg}.configuration_internvl_chat"
    )
    patch_distributed_rank()
    torch.manual_seed(0)
    saved = mod.slowfast
    mod.slowfast = _make_fake_slowfast(feat)
    try:
        with fake_hardcoded_config(_config_payload()):
            cfg = cfg_mod.InternVLChatConfig(
                use_backbone_lora=0,
                use_llm_lora=0,
                select_layer=-1,
                downsample_ratio=0.5,
                ps_version="v2",
                template="internlm2-chat",
                force_image_size=None,
            )
        model = mod.InternVLChatModel(cfg, use_flash_attn=False)
    finally:
        mod.slowfast = saved
    # the reference hard-codes motion_mlp at 2304->4096 and mlpscore at
    # input 4096; rebuild the SAME structures at the tiny dims (our model
    # sizes them from config) before reading the state dict
    torch.manual_seed(1)
    model.motion_mlp = torch.nn.Sequential(
        torch.nn.LayerNorm(FMOT),
        torch.nn.Linear(FMOT, H_LLM),
        torch.nn.GELU(),
        torch.nn.Linear(H_LLM, H_LLM),
    )
    if stage2:
        model.mlpscore = mod.MLP(input_dim=H_LLM)
    model.img_context_token_id = IMG_ID
    return model.eval()


def _build_ours(stage: int):
    vcfg = VisionConfig(
        **VISION,
        qkv_bias=True,
        qk_normalization=False,
        norm_type="layer_norm",
        approximate_gelu=False,
        drop_path_rate=0.0,
        scan_layers=False,
    )
    lcfg = LLMConfig.from_dict(
        {**LLM, "architecture": "InternLM2ForCausalLM", "bias": False}
    )
    lcfg = lcfg.__class__(
        **{**lcfg.__dict__, "rope_scaling": None, "scan_layers": False}
    )
    cfg = AssessorConfig.tiny().replace(
        vision=vcfg,
        llm=lcfg,
        stage=stage,
        downsample_ratio=0.5,
        ps_version="v2",
        select_layer=-1,
        force_image_size=None,
        img_context_token_id=IMG_ID,
        # the reference MLP's fixed widths (`MLP`, stage2_lora:43-95)
        score_head_dims=(1024, 256, 64, 16, 1),
    )
    return cfg, AIGVAssessor(cfg, FP32)


def _inputs(cfg):
    rng = np.random.default_rng(3)
    n_img = cfg.num_image_token * T + 1  # + motion slot
    assert cfg.num_image_token == 49
    n = 3 + n_img + 10
    ids = np.full((B, n), 5, np.int64)
    ids[:, 0] = 1
    ids[:, 3 : 3 + n_img] = IMG_ID
    tail = rng.integers(6, 100, size=(B, 10))
    ids[:, 3 + n_img :] = tail
    labels = np.full((B, n), -100, np.int64)
    labels[:, -10:] = tail
    px = rng.normal(size=(B, T, VISION["image_size"], VISION["image_size"], 3))
    px = (px * 0.1).astype(np.float32)
    mos = np.asarray([0.55, 0.72], np.float32)
    return ids, labels, px, mos


def _torch_forward(model, ids, labels, px, mos):
    import torch

    with torch.no_grad():
        return model(
            mos=torch.from_numpy(mos),
            pixel_values=torch.from_numpy(
                px.reshape(B * T, *px.shape[2:]).transpose(0, 3, 1, 2)
            ).contiguous(),
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.ones(ids.shape, dtype=torch.long),
            image_flags=torch.ones((B * T, 1), dtype=torch.long),
            labels=torch.from_numpy(labels),
        )


@pytest.mark.parametrize("stage2", [False, True], ids=["stage1", "stage2"])
def test_composite_forward_matches_reference(stage2):
    feat = _motion_features()
    pkg = "internvl_chat_stage2_lora" if stage2 else "internvl_chat"
    tmodel = _build_reference(pkg, feat, stage2=stage2)
    cfg, jmodel = _build_ours(stage=2 if stage2 else 1)
    sd = torch_sd_to_numpy(tmodel)
    tree = convert(sd, cfg)

    ids, labels, px, mos = _inputs(cfg)
    ref = _torch_forward(tmodel, ids, labels, px, mos)
    out = jmodel.apply(
        tree,
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(px),
        attention_mask=jnp.ones(ids.shape, bool),
        labels=jnp.asarray(labels, jnp.int32),
        mos=jnp.asarray(mos),
        motion_features=jnp.asarray(feat),
    )
    if stage2:
        # L1 score loss + per-sample scores (hidden[-4] read-out + ReLU MLP)
        np.testing.assert_allclose(
            np.asarray(out["score"]),
            ref["score1"].numpy(),
            rtol=2e-4,
            atol=2e-4,
        )
        np.testing.assert_allclose(
            float(out["loss"]), float(ref["loss"]), rtol=2e-4, atol=2e-4
        )
    else:
        # stage-1: shifted CE over the answer span
        np.testing.assert_allclose(
            float(out["loss"]), float(ref["loss"]), rtol=2e-4, atol=2e-4
        )
        # teacher-forced argmax decode agreement on the labeled span
        # (the stage-1 eval protocol, `stage1_eval.py:928-955`)
        ours_argmax = np.asarray(out["logits"][:, :-1]).argmax(-1).ravel()
        assert (ours_argmax == ref["logit"].numpy().ravel()).mean() > 0.99

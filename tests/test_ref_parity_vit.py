"""Differential parity: our InternViT vs the REFERENCE's own torch code.

Imports `/root/reference/internvl/model/internvl_chat/modeling_intern_vit.py`
(the reference's actual ViT implementation, runnable torch in this image),
random-initializes a tiny config, converts the state dict through
tools/convert_weights, and requires the forward passes to match — including
the on-the-fly pos-embed bicubic interpolation at a non-config input size
(`_get_pos_embed`, modeling_intern_vit.py:87-93) and both norm types and
QK-normalization variants (lines 133-151).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aigv_assessor_tpu.core.config import AssessorConfig, VisionConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.vit import InternVisionModel
from aigv_assessor_tpu.tools.convert_weights import convert

if not os.path.isdir("/root/reference"):  # pragma: no cover
    pytest.skip("reference tree not mounted", allow_module_level=True)

from tests._ref_oracle import import_reference_module, torch_sd_to_numpy

FP32 = Precision.fp32()

TINY = dict(
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=2,
    num_attention_heads=4,
    image_size=56,
    patch_size=14,
)


@pytest.fixture(scope="module")
def ref_vit():
    return import_reference_module(
        "internvl.model.internvl_chat.modeling_intern_vit"
    )


def _build_pair(ref_vit, *, qk_norm: bool, norm_type: str, seed: int = 0):
    import torch

    from internvl.model.internvl_chat.configuration_intern_vit import (
        InternVisionConfig,
    )

    torch.manual_seed(seed)
    tcfg = InternVisionConfig(
        **TINY,
        qkv_bias=True,
        qk_normalization=qk_norm,
        norm_type=norm_type,
        hidden_act="gelu",
        drop_path_rate=0.0,
        dropout=0.0,
        attention_dropout=0.0,
        use_flash_attn=False,
    )
    tmodel = ref_vit.InternVisionModel(tcfg).eval()

    vcfg = VisionConfig(
        **TINY,
        qkv_bias=True,
        qk_normalization=qk_norm,
        norm_type=norm_type,
        approximate_gelu=False,  # reference nn.GELU is erf
        drop_path_rate=0.0,
        scan_layers=False,  # converter emits unrolled layers_{i}
    )
    sd = torch_sd_to_numpy(tmodel, prefix="vision_model.")
    tree = convert(sd, AssessorConfig.tiny().replace(vision=vcfg))
    params = {"params": tree["params"]["vision_model"]}
    jmodel = InternVisionModel(vcfg, FP32)
    return tmodel, jmodel, params


def _diff(tmodel, jmodel, params, size: int, seed: int = 1):
    import torch

    rng = np.random.default_rng(seed)
    px = rng.normal(size=(2, size, size, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(px.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    got = np.asarray(jmodel.apply(params, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize(
    "qk_norm,norm_type",
    [(False, "layer_norm"), (True, "rms_norm"), (True, "layer_norm")],
)
def test_forward_matches_reference(ref_vit, qk_norm, norm_type):
    tmodel, jmodel, params = _build_pair(
        ref_vit, qk_norm=qk_norm, norm_type=norm_type
    )
    _diff(tmodel, jmodel, params, size=TINY["image_size"])


def test_pos_embed_interpolation_matches_reference(ref_vit):
    """Non-config input size exercises `_get_pos_embed`'s on-the-fly bicubic
    (the path a 336/672px eval takes)."""
    tmodel, jmodel, params = _build_pair(
        ref_vit, qk_norm=False, norm_type="layer_norm"
    )
    _diff(tmodel, jmodel, params, size=84)  # 6x6 grid vs trained 4x4
    _diff(tmodel, jmodel, params, size=42)  # downscale too (3x3)


def test_scan_layers_match_reference(ref_vit):
    """Same oracle through the production scan-over-layers path (stacked
    params via adapt_layer_format)."""
    from aigv_assessor_tpu.utils.stacking import stack_layer_params

    tmodel, jmodel, params = _build_pair(
        ref_vit, qk_norm=False, norm_type="layer_norm"
    )
    stacked = {"params": stack_layer_params(params["params"])}
    scfg = jmodel.config.__class__(
        **{**jmodel.config.__dict__, "scan_layers": True}
    )
    smodel = InternVisionModel(scfg, FP32)
    import torch

    rng = np.random.default_rng(3)
    px = rng.normal(size=(2, 56, 56, 3)).astype(np.float32)
    with torch.no_grad():
        want = tmodel(
            torch.from_numpy(px.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    got = np.asarray(smodel.apply(stacked, jnp.asarray(px)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

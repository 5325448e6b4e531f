"""Differential parity: our InternLM2 vs the REFERENCE's own torch code.

Round-3 LLM parity covered only transformers' Llama/Qwen2; this imports
`/root/reference/internvl/model/internlm2/modeling_internlm2.py` — the
decoder the reference actually trains — and diffs logits end-to-end
through tools/convert_weights (interleaved fused-wqkv de-interleave,
`modeling_internlm2.py:375-385`), including a sequence PAST the
dynamic-NTK threshold (`InternLM2DynamicNTKScalingRotaryEmbedding`,
lines 218-245) and linear scaling (198-216).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from aigv_assessor_tpu.core.config import AssessorConfig, LLMConfig, RopeScaling
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.internlm2 import InternLM2ForCausalLM
from aigv_assessor_tpu.tools.convert_weights import convert

if not os.path.isdir("/root/reference"):  # pragma: no cover
    pytest.skip("reference tree not mounted", allow_module_level=True)

from tests._ref_oracle import import_reference_module, torch_sd_to_numpy

FP32 = Precision.fp32()

TINY = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=32,
    rope_theta=10000.0,
    rms_norm_eps=1e-5,
)


@pytest.fixture(scope="module")
def ref_llm():
    return import_reference_module(
        "internvl.model.internlm2.modeling_internlm2"
    )


def _torch_logits(ref_llm, rope_scaling, seq_len, bias, seed=0):
    import torch

    from internvl.model.internlm2.configuration_internlm2 import (
        InternLM2Config,
    )

    torch.manual_seed(seed)
    cfg = InternLM2Config(
        **TINY,
        bias=bias,
        rope_scaling=rope_scaling,
        attn_implementation="eager",
        tie_word_embeddings=False,
    )
    model = ref_llm.InternLM2ForCausalLM(cfg).eval()
    ids = torch.arange(seq_len)[None, :] % TINY["vocab_size"]
    with torch.no_grad():
        logits = model(ids).logits.float().numpy()
    sd = torch_sd_to_numpy(model, prefix="language_model.")
    return logits, sd, np.asarray(ids.numpy(), np.int32)


@pytest.mark.parametrize(
    "rope_scaling,seq_len,bias",
    [
        (None, 24, False),  # base RoPE, within max_position
        (None, 24, True),  # fused-wqkv bias de-interleave
        # dynamic NTK: 48 > max_position 32 -> base rescaled
        # (modeling_internlm2.py:230-236); both sides must build their
        # tables from the SAME sequence length
        ({"type": "dynamic", "factor": 2.0}, 48, False),
        ({"type": "linear", "factor": 2.0}, 48, False),
    ],
)
def test_logits_match_reference(ref_llm, rope_scaling, seq_len, bias):
    torch_logits, sd, ids = _torch_logits(ref_llm, rope_scaling, seq_len, bias)

    llm = LLMConfig.from_dict(
        {
            **TINY,
            "architecture": "InternLM2ForCausalLM",
            "bias": bias,
            "rope_scaling": rope_scaling,
        }
    )
    if rope_scaling is None:
        llm = llm.__class__(**{**llm.__dict__, "rope_scaling": None})
        assert llm.rope_scaling is None
    else:
        assert isinstance(llm.rope_scaling, RopeScaling)
        assert llm.rope_scaling.type == rope_scaling["type"]

    cfg = AssessorConfig.tiny().replace(llm=llm)
    tree = convert(sd, cfg)
    params = {"params": tree["params"]["language_model"]}

    model = InternLM2ForCausalLM(llm, FP32)
    logits, _, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(logits), torch_logits, rtol=2e-4, atol=2e-4
    )

"""Numerical parity of the GQA decoder against transformers' torch models.

The reference dispatches four LLM families
(`/root/reference/internvl/model/internvl_chat/configuration_internvl_chat.py:56-63`).
Llama and Qwen2 are architecturally the same GQA+SwiGLU decoder as InternLM2
with unfused q/k/v projections and different bias/tying conventions; these
tests convert REAL torch state dicts (random-initialized tiny
transformers.LlamaForCausalLM / Qwen2ForCausalLM) through
tools/convert_weights and require logits to match the torch forward — an
end-to-end check of the converter name map, fused-wqkv row order, bias
handling, RoPE convention, and RMSNorm semantics.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aigv_assessor_tpu.core.config import LLMConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.internlm2 import InternLM2ForCausalLM
from aigv_assessor_tpu.tools.convert_weights import convert
from aigv_assessor_tpu.core.config import AssessorConfig

FP32 = Precision.fp32()

TINY = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=256,
    rope_theta=10000.0,
    rms_norm_eps=1e-5,  # HF checkpoints always carry it; defaults differ
)


def _torch_logits_and_sd(arch: str, tie: bool):
    import torch

    torch.manual_seed(0)
    if arch == "LlamaForCausalLM":
        from transformers import LlamaConfig, LlamaForCausalLM

        cfg = LlamaConfig(
            **TINY, attention_bias=False, tie_word_embeddings=tie,
            attn_implementation="eager",
        )
        model = LlamaForCausalLM(cfg)
    else:
        from transformers import Qwen2Config, Qwen2ForCausalLM

        cfg = Qwen2Config(**TINY, tie_word_embeddings=tie,
                          attn_implementation="eager")
        model = Qwen2ForCausalLM(cfg)
    model.eval()
    ids = torch.arange(24)[None, :] % TINY["vocab_size"]
    with torch.no_grad():
        logits = model(ids).logits.float().numpy()
    sd = {
        f"language_model.{k}": v.detach().numpy()
        for k, v in model.state_dict().items()
    }
    return logits, sd, np.asarray(ids.numpy(), np.int32)


@pytest.mark.parametrize(
    "arch,tie",
    [("LlamaForCausalLM", False), ("Qwen2ForCausalLM", True)],
)
def test_logits_match_torch(arch, tie):
    torch_logits, sd, ids = _torch_logits_and_sd(arch, tie)

    llm = LLMConfig.from_dict(
        {**TINY, "architecture": arch, "tie_word_embeddings": tie,
         "rope_scaling": None}
    )
    assert llm.rope_scaling is None
    if arch == "Qwen2ForCausalLM":
        assert llm.effective_qkv_bias and not llm.effective_o_bias

    cfg = AssessorConfig.tiny().replace(llm=llm)
    tree = convert(sd, cfg)
    params = {"params": tree["params"]["language_model"]}

    model = InternLM2ForCausalLM(llm, FP32)
    logits, _, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(logits), torch_logits, rtol=2e-4, atol=2e-4
    )


def test_composite_config_dispatch():
    """4-way dispatch seam (`configuration_internvl_chat.py:56-63`)."""
    base = {**TINY}
    for arch in ("LlamaForCausalLM", "Qwen2ForCausalLM", "InternLM2ForCausalLM"):
        cfg = AssessorConfig.from_dict(
            {"llm_config": {**base, "architectures": [arch]}}
        )
        assert cfg.llm.architecture == arch
    cfg = AssessorConfig.from_dict(
        {"llm_config": {**base, "architectures": ["Phi3ForCausalLM"]}}
    )
    assert cfg.llm.architecture == "Phi3ForCausalLM"
    with pytest.raises(ValueError):
        AssessorConfig.from_dict(
            {"llm_config": {**base, "architectures": ["MambaForCausalLM"]}}
        )

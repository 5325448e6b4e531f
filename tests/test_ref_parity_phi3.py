"""Differential parity: our Phi-3 backbone vs transformers' torch Phi3.

The reference ships Phi-3 as the alternate LLM family
(`/root/reference/internvl/model/phi3/modeling_phi3.py:76-1522`, a vendored
copy of transformers' implementation). transformers is in this image, so
the oracle is `transformers.Phi3ForCausalLM` — random tiny config through
tools/convert_weights (fused plain-concat qkv_proj/gate_up_proj), logits
<= 2e-4, including a sequence PAST the longrope (su) switching threshold
(`original_max_position_embeddings`) where the long factor table and the
sqrt(1 + log(s)/log(orig)) attention scaling kick in.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from aigv_assessor_tpu.core.config import AssessorConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.phi3 import Phi3Config, Phi3ForCausalLM
from aigv_assessor_tpu.tools.convert_weights import convert

FP32 = Precision.fp32()

TINY = dict(
    vocab_size=128,
    hidden_size=64,
    intermediate_size=96,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
    original_max_position_embeddings=32,
    rope_theta=10000.0,
    rms_norm_eps=1e-5,
)

# head_dim = 16 -> 8 rope factors
SHORT = [1.0, 1.1, 1.0, 1.2, 1.05, 1.0, 1.3, 1.0]
LONG = [1.5, 2.0, 1.8, 2.5, 1.9, 2.2, 3.0, 1.7]


def _torch_logits(rope_scaling, seq_len, seed=0):
    import torch
    from transformers import Phi3Config as HFPhi3Config
    from transformers import Phi3ForCausalLM as HFPhi3

    torch.manual_seed(seed)
    cfg = HFPhi3Config(
        **TINY,
        rope_scaling=rope_scaling,
        tie_word_embeddings=False,
        attn_implementation="eager",
        pad_token_id=0,  # HF default 32000 >= tiny vocab
        bos_token_id=1,
        eos_token_id=2,
    )
    model = HFPhi3(cfg).eval()
    ids = torch.arange(seq_len)[None, :] % TINY["vocab_size"]
    with torch.no_grad():
        logits = model(ids).logits.float().numpy()
    sd = {
        f"language_model.{k}": v.detach().numpy()
        for k, v in model.state_dict().items()
    }
    return logits, sd, np.asarray(ids.numpy(), np.int32)


@pytest.mark.parametrize(
    "rope_scaling,seq_len",
    [
        (None, 24),
        # longrope/su past original_max_position_embeddings=32: long-factor
        # table + attention scaling both active
        (
            {"type": "longrope", "short_factor": SHORT, "long_factor": LONG},
            48,
        ),
        # below the threshold the SHORT factor table applies
        (
            {"type": "longrope", "short_factor": SHORT, "long_factor": LONG},
            24,
        ),
    ],
)
def test_logits_match_transformers(rope_scaling, seq_len):
    torch_logits, sd, ids = _torch_logits(rope_scaling, seq_len)

    # convert() stacks layers for scan configs (AssessorConfig.tiny's llm
    # defaults scan_layers=True) -> apply through the production scan path
    cfg = Phi3Config.from_dict(
        {
            **TINY,
            "architecture": "Phi3ForCausalLM",
            "rope_scaling": rope_scaling,
            "scan_layers": True,
        }
    )
    tree = convert(sd, AssessorConfig.tiny())
    params = {"params": tree["params"]["language_model"]}

    model = Phi3ForCausalLM(cfg, FP32)
    logits, _, _ = model.apply(params, jnp.asarray(ids))
    np.testing.assert_allclose(
        np.asarray(logits), torch_logits, rtol=2e-4, atol=2e-4
    )

"""Multi-chip GENERATIVE serving: generate() with GSPMD-sharded parameters.

The perspective/scoring paths already have sharded exactness tests
(tests/test_perspectives.py); this covers the decode surface — prefill +
`lax.while_loop` decode with the KV cache — under a (data, fsdp) mesh, the
TPU replacement for the reference's `split_model` round-robin layer
placement at generation time (`/root/reference/internvl/model/__init__.py:8-29`,
consumed by `chat()`/`generate()`). Parametrized over the int8 KV cache:
the (int8, scale) tuple cache must thread through GSPMD like the bf16 one.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aigv_assessor_tpu.core.config import AssessorConfig
from aigv_assessor_tpu.core.mesh import MeshConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.assessor import AIGVAssessor
from aigv_assessor_tpu.models.generation import GenerationConfig, generate
from aigv_assessor_tpu.models.loading import shard_for_inference
from aigv_assessor_tpu.data.tokenizer import build_test_tokenizer


@pytest.fixture(scope="module")
def setup():
    tok = build_test_tokenizer(model_max_length=512)
    llm = AssessorConfig.tiny().llm.__class__(
        **{
            **AssessorConfig.tiny().llm.__dict__,
            "vocab_size": tok.vocab_size,
            "eos_token_id": tok.eos_token_id,
            "pad_token_id": tok.pad_token_id,
        }
    )
    cfg = AssessorConfig.tiny(stage=1).replace(
        img_context_token_id=int(tok.img_context_token_id), llm=llm
    )
    model = AIGVAssessor(cfg, Precision.fp32())
    ids = jnp.zeros((1, 8), jnp.int32)
    px = jnp.zeros((1, 4, 56, 56, 3), jnp.float32)
    params = model.init(jax.random.key(0), ids, px)
    return tok, cfg, model, params


@pytest.mark.parametrize("kv_int8", [False, True])
def test_sharded_generate_matches_unsharded(setup, kv_int8):
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    tok, cfg, model, params = setup
    if kv_int8:
        model = AIGVAssessor(cfg, dataclasses.replace(
            Precision.fp32(), kv_int8=True))
    rng = np.random.default_rng(7)
    prompt = rng.integers(5, cfg.llm.vocab_size, (4, 10)).astype(np.int32)
    gcfg = GenerationConfig(max_new_tokens=5, eos_token_id=-1)

    ref = generate(model, params, tok, prompt, gcfg=gcfg)

    mesh, sharded = shard_for_inference(
        params, mesh_config=MeshConfig(data=4, fsdp=2, tensor=1)
    )
    with mesh:
        got = generate(model, sharded, tok, prompt, gcfg=gcfg)
    np.testing.assert_array_equal(got, ref)


def test_sharded_generate_left_padded(setup):
    """Left-padded batch (kv_mask + positions) under the mesh."""
    if jax.device_count() < 8:
        pytest.skip("needs the 8-device virtual mesh")
    tok, cfg, model, params = setup
    rng = np.random.default_rng(8)
    prompt = rng.integers(5, cfg.llm.vocab_size, (2, 7)).astype(np.int32)
    pad = 4
    padded = np.concatenate(
        [np.full((2, pad), tok.pad_token_id, np.int32), prompt], axis=1
    )
    mask = np.concatenate(
        [np.zeros((2, pad), np.int32), np.ones((2, 7), np.int32)], axis=1
    )
    gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=-1)
    ref = generate(model, params, tok, padded, attention_mask=mask, gcfg=gcfg)
    mesh, sharded = shard_for_inference(
        params, mesh_config=MeshConfig(data=2, fsdp=4, tensor=1)
    )
    with mesh:
        got = generate(
            model, sharded, tok, padded, attention_mask=mask, gcfg=gcfg
        )
    np.testing.assert_array_equal(got, ref)

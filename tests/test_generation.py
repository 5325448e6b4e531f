"""Generation tests: decode loop vs teacher forcing, chat/batch_chat smoke."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aigv_assessor_tpu.core.config import AssessorConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.assessor import AIGVAssessor
from aigv_assessor_tpu.models.generation import (
    GenerationConfig,
    batch_chat,
    chat,
    generate,
)
from aigv_assessor_tpu.data.tokenizer import build_test_tokenizer

FP32 = Precision.fp32()


@pytest.fixture(scope="module", params=["internlm2", "phi3"])
def setup(request):
    """Generation stack parametrized over BOTH LLM backbones (reference
    dispatches InternLM2 and Phi-3, `configuration_internvl_chat.py:56-63`;
    Phi-3 decode path: `modeling_phi3.py:1078-1310`)."""
    tok = build_test_tokenizer(model_max_length=512)
    if request.param == "phi3":
        from aigv_assessor_tpu.models.phi3 import Phi3Config
        import dataclasses

        llm = dataclasses.replace(
            Phi3Config.tiny(),
            vocab_size=tok.vocab_size,
            eos_token_id=tok.eos_token_id,
            pad_token_id=tok.pad_token_id,
        )
    else:
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
    model = AIGVAssessor(cfg, FP32)
    ids = jnp.zeros((1, 8), jnp.int32)
    px = jnp.zeros((1, 4, 56, 56, 3), jnp.float32)
    params = model.init(jax.random.key(0), ids, px)
    return tok, cfg, model, params


class TestGenerate:
    def test_greedy_matches_teacher_forcing(self, setup):
        """Greedy decode must agree with argmax of a full forward over the
        generated prefix (KV-cache/loop correctness at the generation level)."""
        tok, cfg, model, params = setup
        rng = np.random.default_rng(0)
        prompt = rng.integers(5, cfg.llm.vocab_size, (1, 10)).astype(np.int32)
        gcfg = GenerationConfig(max_new_tokens=5, eos_token_id=-1)  # never stop
        out = generate(model, params, tok, prompt, gcfg=gcfg)
        assert out.shape == (1, 5)

        # teacher-forced check: feed prompt + generated prefix, argmax must
        # reproduce each generated token
        seq = np.concatenate([prompt, out], axis=1)
        logits, _, _ = model.apply(
            params, jnp.asarray(seq), method=lambda m, i: m.language_model(i)
        )
        for t in range(5):
            pred = int(jnp.argmax(logits[0, 10 + t - 1]))
            assert pred == int(out[0, t]), (t, pred, out)

    def test_left_padded_batch_matches_unpadded(self, setup):
        """Left padding + kv_mask + positions: padded decode must equal the
        unpadded single-sample decode."""
        tok, cfg, model, params = setup
        rng = np.random.default_rng(1)
        prompt = rng.integers(5, cfg.llm.vocab_size, (1, 7)).astype(np.int32)
        gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=-1)
        out_ref = generate(model, params, tok, prompt, gcfg=gcfg)

        pad = 5
        padded = np.concatenate(
            [np.full((1, pad), tok.pad_token_id, np.int32), prompt], axis=1
        )
        mask = np.concatenate(
            [np.zeros((1, pad), np.int32), np.ones((1, 7), np.int32)], axis=1
        )
        out_pad = generate(
            model, params, tok, padded, attention_mask=mask, gcfg=gcfg
        )
        np.testing.assert_array_equal(out_ref, out_pad)

    def test_eos_stops_row(self, setup):
        tok, cfg, model, params = setup
        rng = np.random.default_rng(2)
        prompt = rng.integers(5, cfg.llm.vocab_size, (1, 6)).astype(np.int32)
        gcfg = GenerationConfig(max_new_tokens=6, eos_token_id=int(tok.eos_token_id))
        out = generate(model, params, tok, prompt, gcfg=gcfg)
        # once eos appears, everything after must be eos
        row = out[0].tolist()
        if tok.eos_token_id in row:
            i = row.index(tok.eos_token_id)
            assert all(t == tok.eos_token_id for t in row[i:])


class TestChatAPIs:
    def test_chat_motion_smoke(self, setup):
        tok, cfg, model, params = setup
        px = np.random.default_rng(0).normal(size=(4, 56, 56, 3)).astype(np.float32)
        resp = chat(
            model, params, tok, px,
            "How would you rate the static quality of this video?",
            gcfg=GenerationConfig(max_new_tokens=4, eos_token_id=int(tok.eos_token_id)),
            with_motion=True,
        )
        assert isinstance(resp, str)

    def test_batch_chat_smoke(self, setup):
        tok, cfg, model, params = setup
        px = np.random.default_rng(0).normal(size=(2, 4, 56, 56, 3)).astype(np.float32)
        resps = batch_chat(
            model, params, tok, px,
            ["rate this video", "rate the quality of this video please"],
            gcfg=GenerationConfig(max_new_tokens=3, eos_token_id=int(tok.eos_token_id)),
        )
        assert len(resps) == 2 and all(isinstance(r, str) for r in resps)


class TestStreamChat:
    def test_stream_yields_growing_response(self, setup):
        from aigv_assessor_tpu.models.generation import GenerationConfig, stream_chat

        tok, cfg, model, params = setup
        gcfg = GenerationConfig(max_new_tokens=4, eos_token_id=-1)
        chunks = list(
            stream_chat(model, params, tok, "rate the video quality", gcfg=gcfg)
        )
        assert 1 <= len(chunks) <= 4
        assert all(isinstance(c, str) for c in chunks)


class TestSeqClassification:
    def test_logits_shape_and_pooling(self):
        from aigv_assessor_tpu.core.config import LLMConfig
        from aigv_assessor_tpu.core.precision import Precision
        from aigv_assessor_tpu.models.internlm2 import (
            InternLM2ForSequenceClassification,
        )

        cfg = LLMConfig.tiny()
        model = InternLM2ForSequenceClassification(cfg, num_labels=3,
                                                   precision=Precision.fp32())
        rng = np.random.default_rng(0)
        ids = jnp.asarray(rng.integers(0, cfg.vocab_size, (2, 10)), jnp.int32)
        mask = np.ones((2, 10), np.int32)
        mask[1, 6:] = 0  # second sample ends at position 5
        params = model.init(jax.random.key(0), ids, attention_mask=jnp.asarray(mask))
        logits = model.apply(params, ids, attention_mask=jnp.asarray(mask))
        assert logits.shape == (2, 3)
        # pooling position matters: changing a token after the last real one
        # must not change sample 1's logits
        ids2 = ids.at[1, 8].set((ids[1, 8] + 1) % cfg.vocab_size)
        logits2 = model.apply(params, ids2, attention_mask=jnp.asarray(mask))
        np.testing.assert_allclose(
            np.asarray(logits[1]), np.asarray(logits2[1]), atol=1e-5
        )

"""int8 KV cache: quantizer math, attention-path equivalence, generation e2e.

The int8 cache (`ops/kv_quant.py`) is a serving feature with no reference
counterpart (HF keeps fp16 `past_key_values`, `modeling_internlm2.py:395-400`);
its correctness contract here is (a) the fused dequant inside
`two_part_cached_attention` is EXACTLY attention over the dequantized cache,
and (b) end-to-end generation with `Precision(kv_int8=True)` tracks the
fp32-cache run within quantization noise on both backbones.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aigv_assessor_tpu.core.config import AssessorConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.assessor import AIGVAssessor
from aigv_assessor_tpu.models.generation import GenerationConfig, generate
from aigv_assessor_tpu.models.internlm2 import KVCache
from aigv_assessor_tpu.ops.attention import two_part_cached_attention
from aigv_assessor_tpu.ops.kv_quant import (
    dequantize_kv_rows,
    quantize_kv_rows,
)
from aigv_assessor_tpu.data.tokenizer import build_test_tokenizer

FP32_KV8 = dataclasses.replace(Precision.fp32(), kv_int8=True)


class TestQuantizer:
    def test_roundtrip_error_bound(self):
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 9, 4, 32)), jnp.float32
        )
        q, s = quantize_kv_rows(x)
        assert q.dtype == jnp.int8 and s.shape == (2, 9, 4)
        back = dequantize_kv_rows(q, s)
        # symmetric absmax: per-row max abs error <= scale/2 = amax/254
        amax = np.max(np.abs(np.asarray(x)), axis=-1, keepdims=True)
        err = np.abs(np.asarray(back) - np.asarray(x))
        assert np.all(err <= amax / 254.0 + 1e-7)

    def test_zero_rows_exact(self):
        x = jnp.zeros((1, 3, 2, 8), jnp.float32)
        q, s = quantize_kv_rows(x)
        np.testing.assert_array_equal(np.asarray(dequantize_kv_rows(q, s)), 0)


class TestAttentionPath:
    def _setup(self, block_causal=None):
        rng = np.random.default_rng(1)
        b, s, hq, hkv, d, max_len = 2, 4, 4, 2, 16, 12
        q = jnp.asarray(rng.normal(size=(b, s, hq, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(b, s, hkv, d)), jnp.float32)
        ck = jnp.asarray(rng.normal(size=(b, max_len, hkv, d)), jnp.float32)
        cv = jnp.asarray(rng.normal(size=(b, max_len, hkv, d)), jnp.float32)
        idx = jnp.asarray(7, jnp.int32)
        return q, k, v, ck, cv, idx

    @pytest.mark.parametrize("block_causal", [None, 2])
    def test_int8_equals_attention_over_dequantized(self, block_causal):
        """The fused scale application must be bit-for-bit the same math as
        dequantize-then-attend (same contractions, scales just hoisted)."""
        q, k, v, ck, cv, idx = self._setup()
        qk, sk = quantize_kv_rows(ck)
        qv, sv = quantize_kv_rows(cv)
        got = two_part_cached_attention(
            q, k, v, (qk, sk), (qv, sv), idx, block_causal=block_causal
        )
        ref = two_part_cached_attention(
            q, k, v,
            dequantize_kv_rows(qk, sk), dequantize_kv_rows(qv, sv), idx,
            block_causal=block_causal,
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_int8_close_to_unquantized(self):
        q, k, v, ck, cv, idx = self._setup()
        ref = two_part_cached_attention(q, k, v, ck, cv, idx)
        got = two_part_cached_attention(
            q, k, v, quantize_kv_rows(ck), quantize_kv_rows(cv), idx
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0.05, atol=0.03
        )

    def test_kv_mask_respected(self):
        """Masked (padded) cache slots must not leak into the output even
        when their quantized values are garbage."""
        q, k, v, ck, cv, idx = self._setup()
        kv_mask = np.ones((2, 12), bool)
        kv_mask[:, 5:7] = False  # inside the valid-index range
        poisoned_k = ck.at[:, 5:7].set(1e4)
        poisoned_v = cv.at[:, 5:7].set(1e4)
        ref = two_part_cached_attention(
            q, k, v, ck, cv, idx, kv_mask=jnp.asarray(kv_mask)
        )
        got = two_part_cached_attention(
            q, k, v,
            quantize_kv_rows(poisoned_k), quantize_kv_rows(poisoned_v), idx,
            kv_mask=jnp.asarray(kv_mask),
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0.05, atol=0.03
        )


@pytest.fixture(scope="module", params=["internlm2", "phi3"])
def gen_setup(request):
    tok = build_test_tokenizer(model_max_length=512)
    if request.param == "phi3":
        from aigv_assessor_tpu.models.phi3 import Phi3Config

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
    model_fp32 = AIGVAssessor(cfg, Precision.fp32())
    model_kv8 = AIGVAssessor(cfg, FP32_KV8)
    ids = jnp.zeros((1, 8), jnp.int32)
    px = jnp.zeros((1, 4, 56, 56, 3), jnp.float32)
    params = model_fp32.init(jax.random.key(0), ids, px)
    return tok, cfg, model_fp32, model_kv8, params


class TestGenerationE2E:
    def test_prefill_logits_close(self, gen_setup):
        """Prefill through an int8 cache must produce logits close to the
        fp32-cache prefill (the prefill itself attends the UNQUANTIZED new
        rows, so only later reads differ — here: none, logits near-exact)."""
        tok, cfg, model_fp32, model_kv8, params = gen_setup
        rng = np.random.default_rng(0)
        prompt = rng.integers(5, cfg.llm.vocab_size, (2, 10)).astype(np.int32)
        max_len = 16

        def prefill(model, quantized):
            embeds = model.apply(
                params, jnp.asarray(prompt), method="embed_tokens"
            )
            cache = KVCache.init(
                cfg.llm, 2, max_len, dtype=jnp.float32, quantized=quantized
            )
            logits, _, new_cache = model.apply(
                params, embeds, cache, method="prefill"
            )
            return logits, new_cache

        ref, _ = prefill(model_fp32, False)
        got, cache = prefill(model_kv8, True)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4
        )
        assert isinstance(cache.k, tuple) and cache.k[0].dtype == jnp.int8
        # written scales must differ from the init value somewhere
        assert np.asarray(cache.k[1][:, :, :10]).std() > 0

    def test_generate_tracks_fp32(self, gen_setup):
        """Greedy decode with the int8 cache: same shapes, and the token
        stream matches the fp32-cache run on a tiny random model (logit gaps
        are large relative to int8 rounding at this scale)."""
        tok, cfg, model_fp32, model_kv8, params = gen_setup
        rng = np.random.default_rng(3)
        prompt = rng.integers(5, cfg.llm.vocab_size, (2, 9)).astype(np.int32)
        gcfg = GenerationConfig(max_new_tokens=5, eos_token_id=-1)
        ref = generate(model_fp32, params, tok, prompt, gcfg=gcfg)
        got = generate(model_kv8, params, tok, prompt, gcfg=gcfg)
        assert got.shape == ref.shape == (2, 5)
        # quantization can flip a near-tie; demand >= 80% agreement and
        # agreement on the very first decoded token
        agree = (got == ref).mean()
        assert agree >= 0.8, (agree, got, ref)
        np.testing.assert_array_equal(got[:, 0], ref[:, 0])

    def test_unrolled_loop_path(self, gen_setup):
        """scan_layers=False exercises the python-loop cache write path."""
        tok, cfg, model_fp32, model_kv8, params = gen_setup
        if not cfg.llm.scan_layers:
            pytest.skip("tiny config already unrolled")
        llm = dataclasses.replace(cfg.llm, scan_layers=False)
        cfg2 = cfg.replace(llm=llm)
        from aigv_assessor_tpu.utils.stacking import (
            has_stacked_layers,
            unstack_layer_params,
        )

        p2 = params
        inner = p2["params"]["language_model"]
        if has_stacked_layers(inner):
            p2 = jax.tree_util.tree_map(lambda x: x, params)
            p2["params"]["language_model"] = unstack_layer_params(inner)
        model2 = AIGVAssessor(cfg2, FP32_KV8)
        rng = np.random.default_rng(4)
        prompt = rng.integers(5, cfg.llm.vocab_size, (1, 6)).astype(np.int32)
        gcfg = GenerationConfig(max_new_tokens=3, eos_token_id=-1)
        out = generate(model2, p2, tok, prompt, gcfg=gcfg)
        assert out.shape == (1, 3)
        ref = generate(model_kv8, params, tok, prompt, gcfg=gcfg)
        np.testing.assert_array_equal(out, ref)

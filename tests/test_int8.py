"""Int8 matmul kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from aigv_assessor_tpu.ops.int8_matmul import int8_matmul, quantize_weight


class TestInt8Matmul:
    @pytest.mark.parametrize("m", [1, 7, 64])
    def test_matches_dequantized_reference(self, m):
        rng = np.random.default_rng(0)
        k, n = 256, 512
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
        q, scale = quantize_weight(w)
        want = np.asarray(x) @ (np.asarray(q, np.float32) * np.asarray(scale)[None, :])
        with pltpu.force_tpu_interpret_mode():
            got = int8_matmul(x, q, scale, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)

    def test_quantization_error_bounded(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(128, 64)), jnp.float32)
        q, scale = quantize_weight(w)
        deq = np.asarray(q, np.float32) * np.asarray(scale)[None, :]
        err = np.abs(deq - np.asarray(w)).max()
        assert err <= float(jnp.abs(w).max()) / 127.0 + 1e-6


class TestInt8Serving:
    """W8A16 serving path: Int8Dense modules over tools/convert_to_int8
    checkpoints (the TPU-native load_in_8bit,
    `/root/reference/internvl/model/__init__.py:32-44`)."""

    def test_llm_int8_matches_dequantized(self):
        import dataclasses

        import jax
        import jax.numpy as jnp
        from flax import traverse_util

        from aigv_assessor_tpu.core.config import LLMConfig
        from aigv_assessor_tpu.core.precision import Precision
        from aigv_assessor_tpu.models.internlm2 import InternLM2ForCausalLM
        from aigv_assessor_tpu.tools.convert_to_int8 import (
            dequantize_tree,
            quantize_tree,
        )

        cfg = LLMConfig.tiny()
        fp = Precision.fp32()
        model = InternLM2ForCausalLM(cfg, fp)
        ids = jnp.arange(12)[None, :] % cfg.vocab_size
        params = model.init(jax.random.key(0), ids)
        qparams = quantize_tree(
            jax.tree_util.tree_map(lambda x: np.asarray(x), params),
            min_size=1,
            scope="",  # bare LLM tree (no language_model level)
        )
        # quantized tree has int8 kernels for every LLM dense + head
        flat = traverse_util.flatten_dict(qparams)
        n_int8 = sum(1 for k in flat if str(k[-1]) == "kernel_int8")
        # scan-over-layers: 5 stacked decoder kernels + the LM head
        assert n_int8 == 5 + 1, n_int8

        int8_model = InternLM2ForCausalLM(
            cfg, dataclasses.replace(fp, int8_weights=True)
        )
        logits_q, _, _ = int8_model.apply(qparams, ids)

        deq = dequantize_tree(qparams)
        logits_d, _, _ = model.apply(deq, ids)
        np.testing.assert_allclose(
            np.asarray(logits_q), np.asarray(logits_d), rtol=2e-2, atol=2e-2
        )
        # and the quantization itself is close to the fp32 model
        logits_f, _, _ = model.apply(params, ids)
        err = np.abs(np.asarray(logits_q) - np.asarray(logits_f)).max()
        scale = np.abs(np.asarray(logits_f)).max()
        assert err < 0.15 * max(scale, 1.0), (err, scale)

    def test_int8_matmul_ragged_n(self):
        """n not a multiple of the block (vocab 92553-style) pads cleanly."""
        from jax.experimental.pallas import tpu as pltpu

        from aigv_assessor_tpu.ops.int8_matmul import int8_matmul, quantize_weight

        rng = np.random.default_rng(0)
        w = jnp.asarray(rng.normal(size=(64, 300)), jnp.float32)
        x = jnp.asarray(rng.normal(size=(5, 64)), jnp.bfloat16)
        q, s = quantize_weight(w)
        with pltpu.force_tpu_interpret_mode():
            y = int8_matmul(x, q, s, block_n=128, block_k=64)
        ref = (x.astype(jnp.float32) @ (q.astype(jnp.float32) * s[None, :]))
        np.testing.assert_allclose(
            np.asarray(y, np.float32), np.asarray(ref), rtol=2e-2, atol=2e-2
        )


class TestInt4:
    def test_int4_roundtrip_accuracy(self):
        """4-bit export (reference load_in_4bit parity at the checkpoint
        level): pack/unpack is exact for the quantized grid and within
        1-step quantization error for real values; odd in_dims pad."""
        from aigv_assessor_tpu.tools.convert_to_int8 import (
            dequantize_kernel_int4,
            quantize_kernel_int4,
        )

        rng = np.random.default_rng(0)
        for shape in [(64, 32), (33, 16), (3, 10, 8)]:
            w = rng.normal(size=shape).astype(np.float32)
            packed, scale = quantize_kernel_int4(w)
            assert packed.shape[-2] == (shape[-2] + 1) // 2
            back = dequantize_kernel_int4(packed, scale, shape[-2])
            assert back.shape == w.shape
            # max error is half a quantization step per channel
            step = np.abs(w).max(axis=-2, keepdims=True) / 7.0
            assert np.all(np.abs(back - w) <= 0.5 * step + 1e-7)

    def test_int4_tree_and_load_dequant(self):
        from flax import traverse_util

        from aigv_assessor_tpu.tools.convert_to_int8 import (
            dequantize_tree,
            quantize_tree_int4,
        )

        rng = np.random.default_rng(1)
        params = {
            "language_model": {
                "w": {"kernel": rng.normal(size=(64, 48)).astype(np.float32)}
            },
            "mlp1": {"fc1": {"kernel": rng.normal(size=(64, 48)).astype(np.float32)}},
        }
        qt = quantize_tree_int4(params, min_size=10)
        flat = traverse_util.flatten_dict(qt)
        assert ("language_model", "w", "kernel_int4") in flat
        # outside scope untouched
        assert ("mlp1", "fc1", "kernel") in flat
        back = traverse_util.flatten_dict(dequantize_tree(qt))
        assert ("language_model", "w", "kernel") in back
        assert back[("language_model", "w", "kernel")].shape == (64, 48)


class TestInt4Kernel:
    """W4A16 pallas kernel: in-kernel nibble unpack (interpret mode)."""

    @pytest.mark.parametrize("m,k,n", [(8, 64, 128), (16, 130, 256), (1, 128, 384)])
    def test_matches_dequantized_reference(self, m, k, n):
        from aigv_assessor_tpu.ops.int8_matmul import int4_matmul
        from aigv_assessor_tpu.tools.convert_to_int8 import (
            dequantize_kernel_int4,
            quantize_kernel_int4,
        )

        rng = np.random.default_rng(0)
        w = rng.normal(size=(k, n)).astype(np.float32)
        x = rng.normal(size=(m, k)).astype(np.float32)
        packed, scale = quantize_kernel_int4(w)
        w_deq = dequantize_kernel_int4(packed, scale, k)
        ref = x @ w_deq

        got = int4_matmul(
            jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scale),
            block_k=64, out_dtype=jnp.float32, interpret=True,
        )
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    def test_dense_apply_cpu_fallback(self):
        from aigv_assessor_tpu.ops.int8_matmul import int4_dense_apply
        from aigv_assessor_tpu.tools.convert_to_int8 import (
            dequantize_kernel_int4,
            quantize_kernel_int4,
        )

        rng = np.random.default_rng(1)
        k, n = 96, 160
        w = rng.normal(size=(k, n)).astype(np.float32)
        x = rng.normal(size=(2, 3, k)).astype(np.float32)
        packed, scale = quantize_kernel_int4(w)
        got = int4_dense_apply(
            jnp.asarray(x), jnp.asarray(packed), jnp.asarray(scale),
            out_dtype=jnp.float32,
        )
        ref = x.reshape(-1, k) @ dequantize_kernel_int4(packed, scale, k)
        np.testing.assert_allclose(
            np.asarray(got).reshape(-1, n), ref, rtol=2e-4, atol=2e-4
        )


class TestInt4Serving:
    """W4A16 serving path: Int4Dense modules over `--bits 4` checkpoints
    (the TPU-native load_in_4bit with packed weights kept packed)."""

    def test_llm_int4_matches_dequantized(self):
        import dataclasses

        import jax
        import jax.numpy as jnp
        from flax import traverse_util

        from aigv_assessor_tpu.core.config import LLMConfig
        from aigv_assessor_tpu.core.precision import Precision
        from aigv_assessor_tpu.models.internlm2 import InternLM2ForCausalLM
        from aigv_assessor_tpu.tools.convert_to_int8 import (
            dequantize_tree,
            quantize_tree_int4,
            strip_int4_meta,
        )

        cfg = LLMConfig.tiny()
        fp = Precision.fp32()
        model = InternLM2ForCausalLM(cfg, fp)
        ids = jnp.arange(12)[None, :] % cfg.vocab_size
        params = model.init(jax.random.key(0), ids)
        qparams = quantize_tree_int4(
            jax.tree_util.tree_map(lambda x: np.asarray(x), params),
            min_size=1,
            scope="",
        )
        flat = traverse_util.flatten_dict(qparams)
        n_int4 = sum(1 for k in flat if str(k[-1]) == "kernel_int4")
        assert n_int4 == 5 + 1, n_int4

        int4_model = InternLM2ForCausalLM(
            cfg, dataclasses.replace(fp, int4_weights=True)
        )
        logits_q, _, _ = int4_model.apply(strip_int4_meta(qparams), ids)

        deq = dequantize_tree(qparams)
        logits_d, _, _ = model.apply(deq, ids)
        np.testing.assert_allclose(
            np.asarray(logits_q), np.asarray(logits_d), rtol=2e-2, atol=2e-2
        )

    def test_int4_base_composes_with_lora(self):
        """Serving an int4 checkpoint with LoRA adapters attached: the
        LoRADense int4 base runs the packed kernel and the (zero-init)
        LoRA delta leaves it exactly at the base output."""
        import jax
        import jax.numpy as jnp

        from aigv_assessor_tpu.models.lora import (
            Int4Dense,
            LoRAConfig,
            LoRADense,
        )

        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(2, 6, 16)), jnp.float32
        )
        lora = LoRADense(
            24, dtype=jnp.float32, lora=LoRAConfig(r=4, alpha=8), int4=True
        )
        p = lora.init(jax.random.key(1), x)
        flat = {
            "/".join(map(str, k)): v
            for k, v in jax.tree_util.tree_flatten_with_path(p)[0]
        }
        assert any("kernel_int4" in k for k in flat), list(flat)
        assert any("lora_a" in k for k in flat)
        y = lora.apply(p, x)

        base = Int4Dense(24, dtype=jnp.float32)
        yb = base.apply(
            {"params": p["params"]["base"]}, x
        )
        np.testing.assert_allclose(np.asarray(y), np.asarray(yb), rtol=1e-6)

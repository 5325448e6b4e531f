"""Real-checkpoint-format ingestion drive (VERDICT r2 gap #1).

A synthetic checkpoint in the EXACT on-disk format real InternVL2/
AIGV-Assessor checkpoints ship in — sharded bf16 safetensors +
`model.safetensors.index.json`, reference torch module names including the
interleaved fused wqkv and the pytorchvideo SlowFast tree — is driven
through the full pipeline: `convert_weights` CLI -> `params.msgpack` ->
`load_model_and_tokenizer` -> jitted forward. Any drift in a key name,
fusion layout, or kernel orientation fails here (strict converter + logits
round-trip vs direct construction).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import traverse_util

from aigv_assessor_tpu.core.config import AssessorConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.assessor import AIGVAssessor
from aigv_assessor_tpu.tools.convert_weights import (
    convert,
    load_torch_state_dict,
    resolve_checkpoint_files,
)
from aigv_assessor_tpu.tools.make_synthetic_ckpt import (
    make_synthetic_checkpoint,
    reference_config_dict,
)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("synthetic_ckpt")
    cfg = make_synthetic_checkpoint(str(d), stage=2, n_shards=2, seed=0)
    return str(d), cfg


class TestResolution:
    def test_sharded_index_resolution(self, ckpt):
        d, _ = ckpt
        files = resolve_checkpoint_files(d)
        assert [os.path.basename(f) for f in files] == [
            "model-00001-of-00002.safetensors",
            "model-00002-of-00002.safetensors",
        ]

    def test_single_safetensors_file(self, ckpt):
        d, _ = ckpt
        f = os.path.join(d, "model-00001-of-00002.safetensors")
        sd = load_torch_state_dict([f])
        assert sd and all(isinstance(v, np.ndarray) for v in sd.values())

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            resolve_checkpoint_files(str(tmp_path))


class TestFullKeyCoverage:
    def test_every_key_mapped_every_param_covered(self, ckpt):
        """strict=True: no checkpoint key may be dropped; and the converted
        tree must cover every model parameter (slowfast included) with the
        right shape."""
        d, cfg = ckpt
        sd = load_torch_state_dict([d])
        converted = convert(sd, cfg, strict=True)

        model = AIGVAssessor(cfg, Precision.fp32())
        ids = jnp.zeros((1, 32), jnp.int32)
        px = jnp.zeros((1, 4, 56, 56, 3), jnp.float32)
        template = jax.eval_shape(
            lambda: model.init(jax.random.key(0), ids, px, mos=jnp.zeros((1,)))
        )
        tflat = traverse_util.flatten_dict(template)
        cflat = traverse_util.flatten_dict(converted)
        for key, val in cflat.items():
            assert key in tflat, f"converted key not in model: {key}"
            assert tflat[key].shape == val.shape, (
                key, tflat[key].shape, val.shape,
            )
        missing = [k for k in tflat if k not in cflat]
        assert not missing, f"model params not covered: {missing[:10]}"


class TestEndToEndRoundTrip:
    def test_cli_convert_then_load_then_forward(self, ckpt):
        d, cfg = ckpt
        from aigv_assessor_tpu.tools import convert_weights

        out = os.path.join(d, "params.msgpack")
        convert_weights.main(
            [
                "--torch_ckpt", d,
                "--config", os.path.join(d, "config.json"),
                "--out", out,
                "--strict",
            ]
        )
        assert os.path.exists(out)

        from aigv_assessor_tpu.models.loading import load_model_and_tokenizer

        lcfg, model, params, tokenizer = load_model_and_tokenizer(
            d, stage=2, precision=Precision.fp32()
        )
        assert lcfg.llm.num_hidden_layers == cfg.llm.num_hidden_layers

        b, t = 1, 4
        n_ctx = t * lcfg.num_image_token + 1
        seq = n_ctx + 8
        rng = np.random.default_rng(1)
        ids = rng.integers(5, min(lcfg.llm.vocab_size, 200), (b, seq))
        ids[:, 1 : 1 + n_ctx] = lcfg.img_context_token_id
        ids = jnp.asarray(ids, jnp.int32)
        px = jnp.asarray(rng.normal(size=(b, t, 56, 56, 3)), jnp.float32)

        out1 = jax.jit(
            lambda p, i, x: model.apply(p, i, x, deterministic=True)
        )(params, ids, px)

        # direct construction: same tensors through the in-memory converter
        # path (no msgpack, no CLI) must produce identical logits
        sd = load_torch_state_dict([d])
        direct = convert(sd, cfg, strict=True)
        model2 = AIGVAssessor(cfg, Precision.fp32())
        out2 = model2.apply(direct, ids, px, deterministic=True)

        np.testing.assert_allclose(
            np.asarray(out1["logits"], np.float32),
            np.asarray(out2["logits"], np.float32),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out1["score"]), np.asarray(out2["score"]),
            rtol=1e-5, atol=1e-5,
        )
        assert np.all(np.isfinite(np.asarray(out1["logits"], np.float32)))

    def test_orientation_drift_fails(self, ckpt):
        """A transposed kernel (the classic orientation bug) must be caught
        by the shape check, not silently loaded."""
        d, cfg = ckpt
        sd = load_torch_state_dict([d])
        key = "language_model.model.layers.0.feed_forward.w1.weight"
        sd[key] = np.ascontiguousarray(sd[key].T)
        try:
            converted = convert(sd, cfg, strict=True)
        except ValueError:
            # cross-layer shape drift already explodes at layer stacking —
            # that IS detection
            return
        model = AIGVAssessor(cfg, Precision.fp32())
        ids = jnp.zeros((1, 32), jnp.int32)
        px = jnp.zeros((1, 4, 56, 56, 3), jnp.float32)
        template = jax.eval_shape(
            lambda: model.init(jax.random.key(0), ids, px, mos=jnp.zeros((1,)))
        )
        tflat = traverse_util.flatten_dict(template)
        cflat = traverse_util.flatten_dict(converted)
        bad = [
            k for k, v in cflat.items()
            if k in tflat and tflat[k].shape != v.shape
        ]
        assert bad, "transposed kernel was not detected"


class TestConfigRoundTrip:
    def test_reference_config_parses_back(self, ckpt):
        _, cfg = ckpt
        d2 = AssessorConfig.from_dict(reference_config_dict(cfg))
        assert d2.llm.num_key_value_heads == cfg.llm.num_key_value_heads
        assert d2.vision.num_hidden_layers == cfg.vision.num_hidden_layers
        assert d2.template == cfg.template


class TestQuantizedLoadDtypes:
    def test_int8_load_keeps_fp32_scales(self, ckpt):
        """load_model_and_tokenizer(int8=True) at bf16 serving precision:
        dequant scales must stay fp32 (bf16 scales add ~0.4% relative error
        on every dequantized weight) while plain fp32 weights are cast to
        bf16 — matching cli/common.build_serving_stack's cast-then-quantize
        order."""
        d, cfg = ckpt
        msg = os.path.join(d, "params.msgpack")
        if not os.path.exists(msg):
            from aigv_assessor_tpu.tools import convert_weights

            convert_weights.main(
                ["--torch_ckpt", d, "--config",
                 os.path.join(d, "config.json"), "--out", msg, "--strict"]
            )
        from aigv_assessor_tpu.models.loading import load_model_and_tokenizer

        _, model, params, _ = load_model_and_tokenizer(d, stage=2, int8=True)
        flat = traverse_util.flatten_dict(params)
        scales = {k: v for k, v in flat.items() if str(k[-1]) == "kernel_scale"}
        assert scales, "int8 load produced no kernel_scale leaves"
        for k, v in scales.items():
            assert v.dtype == np.float32, (k, v.dtype)
        kernels = [
            v for k, v in flat.items() if str(k[-1]) == "kernel_int8"
        ]
        assert kernels and all(v.dtype == np.int8 for v in kernels)
        # non-quantized fp32 storage was cast down for serving
        others = [
            v for k, v in flat.items()
            if str(k[-1]) not in ("kernel_scale", "kernel_int8")
            and hasattr(v, "dtype") and v.dtype == np.float32
        ]
        assert not others, f"{len(others)} fp32 leaves survived the cast"

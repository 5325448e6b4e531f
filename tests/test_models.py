"""Model-level tests on tiny configs (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from aigv_assessor_tpu.core.config import AssessorConfig, LLMConfig, VisionConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.assessor import AIGVAssessor
from aigv_assessor_tpu.models.internlm2 import (
    InternLM2ForCausalLM,
    KVCache,
    cross_entropy_loss,
)
from aigv_assessor_tpu.models.motion import SlowFastR50, pack_pathways
from aigv_assessor_tpu.models.vit import InternVisionModel

from aigv_assessor_tpu.core.config import MotionConfig

FP32 = Precision.fp32()


class TestViT:
    def test_output_shape(self):
        cfg = VisionConfig.tiny()
        model = InternVisionModel(cfg, FP32)
        x = jnp.zeros((2, 56, 56, 3))
        params = model.init(jax.random.key(0), x)
        out = model.apply(params, x)
        # 56/14 = 4 -> 16 patches + cls
        assert out.shape == (2, 17, cfg.hidden_size)

    def test_pos_embed_interpolation(self):
        """A different input resolution reuses the same params (on-device
        bicubic interpolation, reference modeling_intern_vit.py:87-93)."""
        cfg = VisionConfig.tiny()
        model = InternVisionModel(cfg, FP32)
        params = model.init(jax.random.key(0), jnp.zeros((1, 56, 56, 3)))
        out = model.apply(params, jnp.zeros((1, 84, 84, 3)))
        assert out.shape == (1, 1 + 36, cfg.hidden_size)

    def test_select_layer(self):
        cfg = VisionConfig.tiny()
        model = InternVisionModel(cfg, FP32)
        x = jnp.ones((1, 56, 56, 3))
        params = model.init(jax.random.key(0), x)
        h_minus_1 = model.apply(params, x, select_layer=-1)
        h_first = model.apply(params, x, select_layer=1)
        assert h_minus_1.shape == h_first.shape
        assert not np.allclose(np.asarray(h_minus_1), np.asarray(h_first))


class TestInternLM2:
    def _tiny(self):
        cfg = LLMConfig.tiny()
        model = InternLM2ForCausalLM(cfg, FP32)
        ids = jnp.asarray(np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 12)))
        params = model.init(jax.random.key(0), ids)
        return cfg, model, params, ids

    def test_logits_shape_fp32(self):
        cfg, model, params, ids = self._tiny()
        logits, hidden, cache = model.apply(params, ids)
        assert logits.shape == (2, 12, cfg.vocab_size)
        assert logits.dtype == jnp.float32
        assert hidden.shape == (2, 12, cfg.hidden_size)
        assert cache is None

    def test_causality(self):
        """Changing a future token must not change past logits."""
        cfg, model, params, ids = self._tiny()
        logits1, _, _ = model.apply(params, ids)
        ids2 = ids.at[:, -1].set((ids[:, -1] + 1) % cfg.vocab_size)
        logits2, _, _ = model.apply(params, ids2)
        np.testing.assert_allclose(
            np.asarray(logits1[:, :-1]), np.asarray(logits2[:, :-1]), atol=1e-5
        )
        assert not np.allclose(np.asarray(logits1[:, -1]), np.asarray(logits2[:, -1]))

    def test_kv_cache_decode_matches_full_forward(self):
        """Prefill + stepwise decode must reproduce the full forward logits
        (replaces the reference's growing past_key_values,
        modeling_internlm2.py:395-400)."""
        cfg, model, params, ids = self._tiny()
        full_logits, _, _ = model.apply(params, ids)

        cache = KVCache.init(cfg, batch=2, max_len=16, dtype=jnp.float32)
        prefix = ids[:, :8]
        logits_p, _, cache = model.apply(params, prefix, cache=cache)
        np.testing.assert_allclose(
            np.asarray(logits_p), np.asarray(full_logits[:, :8]), atol=2e-3, rtol=1e-3
        )
        for t in range(8, 12):
            step_logits, _, cache = model.apply(params, ids[:, t : t + 1], cache=cache)
            np.testing.assert_allclose(
                np.asarray(step_logits[:, 0]),
                np.asarray(full_logits[:, t]),
                atol=2e-3,
                rtol=1e-3,
            )

    def test_cross_entropy_ignores_masked(self):
        logits = jnp.zeros((1, 4, 8))
        labels = jnp.array([[-100, 2, -100, 3]])
        loss = cross_entropy_loss(logits, labels)
        # uniform logits -> log(8); only positions 1(->2) and 3 shifted
        np.testing.assert_allclose(float(loss), np.log(8), rtol=1e-5)


class TestMotion:
    def test_pack_pathways_linspace(self):
        """Slow path picks linspace frames: T=8 -> {0, 7}
        (reference pack_pathway_output, modeling_internvl_chat.py:89-97)."""
        frames = jnp.arange(8.0)[None, :, None, None, None] * jnp.ones((1, 8, 2, 2, 3))
        slow, fast = pack_pathways(frames, alpha=4)
        assert slow.shape[1] == 2
        np.testing.assert_array_equal(
            np.asarray(slow[0, :, 0, 0, 0]), np.array([0.0, 7.0])
        )
        assert fast.shape[1] == 8

    def test_feature_dim(self):
        cfg = MotionConfig.tiny()
        model = SlowFastR50(cfg, FP32)
        frames = jnp.zeros((2, 8, 64, 64, 3))
        params = model.init(jax.random.key(0), frames)
        feat = model.apply(params, frames)
        assert feat.shape == (2, cfg.feature_dim)


def _make_batch(cfg: AssessorConfig, b=2, frames=4, seq=96, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    ctx = cfg.img_context_token_id
    tok_per_frame = cfg.num_image_token
    n_ctx = frames * tok_per_frame + 1  # + motion token
    ids = rng.integers(5, cfg.llm.vocab_size, (b, seq))
    ids[:, 2 : 2 + n_ctx] = ctx
    labels = np.full((b, seq), -100)
    labels[:, -6:] = rng.integers(5, cfg.llm.vocab_size, (b, 6))
    pixels = rng.normal(size=(b, frames, cfg.vision.image_size, cfg.vision.image_size, 3))
    mos = rng.uniform(0, 1, (b,))
    return (
        jnp.asarray(ids, jnp.int32),
        jnp.asarray(pixels, jnp.float32),
        jnp.asarray(labels, jnp.int32),
        jnp.asarray(mos, jnp.float32),
    )


class TestAssessor:
    def test_stage1_forward(self):
        cfg = AssessorConfig.tiny(stage=1).replace(img_context_token_id=4)
        model = AIGVAssessor(cfg, FP32)
        ids, pixels, labels, mos = _make_batch(cfg)
        params = model.init(jax.random.key(0), ids, pixels, labels=labels)
        out = model.apply(params, ids, pixels, labels=labels)
        assert "loss" in out and np.isfinite(float(out["loss"]))
        assert out["logits"].shape == (2, 96, cfg.llm.vocab_size)

    def test_stage2_score_and_l1(self):
        cfg = AssessorConfig.tiny(stage=2).replace(img_context_token_id=4)
        model = AIGVAssessor(cfg, FP32)
        ids, pixels, labels, mos = _make_batch(cfg)
        params = model.init(jax.random.key(0), ids, pixels, labels=labels, mos=mos)
        out = model.apply(params, ids, pixels, labels=labels, mos=mos)
        assert out["score"].shape == (2,)
        assert np.all(np.asarray(out["score"]) >= 0)  # final-layer ReLU
        want = np.mean(np.abs(np.asarray(out["score"]) - np.asarray(mos)))
        np.testing.assert_allclose(float(out["loss"]), want, rtol=1e-5)
        assert "ce_loss" in out  # computed but not the trained loss

    def test_motion_stop_gradient(self):
        """No gradient may flow into the slowfast trunk (reference wraps it in
        torch.no_grad, modeling_internvl_chat.py:161); motion_mlp does get
        gradients (it is stage-1 trainable)."""
        cfg = AssessorConfig.tiny(stage=1).replace(img_context_token_id=4)
        model = AIGVAssessor(cfg, FP32)
        ids, pixels, labels, mos = _make_batch(cfg)
        params = model.init(jax.random.key(0), ids, pixels, labels=labels)

        def loss_fn(p):
            return model.apply(p, ids, pixels, labels=labels)["loss"]

        grads = jax.grad(loss_fn)(params)
        sf = grads["params"]["slowfast_model"]
        leaves = jax.tree_util.tree_leaves(sf)
        assert all(float(jnp.abs(leaf).max()) == 0.0 for leaf in leaves)
        mm = grads["params"]["motion_mlp"]
        assert any(float(jnp.abs(leaf).max()) > 0 for leaf in jax.tree_util.tree_leaves(mm))

    def test_lora_params_exist(self):
        cfg = AssessorConfig.tiny(stage=2).replace(
            img_context_token_id=4, use_backbone_lora=4, use_llm_lora=4
        )
        model = AIGVAssessor(cfg, FP32)
        ids, pixels, labels, mos = _make_batch(cfg)
        params = model.init(jax.random.key(0), ids, pixels, labels=labels, mos=mos)
        flat = jax.tree_util.tree_flatten_with_path(params)[0]
        paths = ["/".join(str(k.key) for k in path) for path, _ in flat]
        assert any("lora_a" in p and "vision_model" in p for p in paths)
        assert any("lora_a" in p and "wqkv" in p for p in paths)
        assert any("lora_b" in p and "feed_forward" in p for p in paths)

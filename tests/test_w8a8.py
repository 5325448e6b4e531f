"""W8A8 int8-MXU serving path (`ops/w8a8.py`, `Precision.w8a8`).

On v5e, XLA lowers int8 x int8 -> int32 `dot_general` natively at ~1.8x
the bf16 MXU rate (measured: benchmarks/int8_xla_probe.py round 4, 330-375
TOPS with the fp32 scaling epilogue vs 190-197 TFLOP/s bf16). These tests
pin the numerics on CPU: exactness when activation quantization is
lossless, layout equivalence of the head-major variants, and bounded
end-to-end drift of the composite scoring forward.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from flax import traverse_util

from aigv_assessor_tpu.ops.w8a8 import (
    quantize_rows,
    w8a8_head_major,
    w8a8_head_major_in,
    w8a8_matmul,
)


class TestOps:
    def test_exact_when_activations_are_int(self):
        """Integer activations in [-127, 127] quantize losslessly, so the
        W8A8 result must equal the fp computation exactly."""
        rng = np.random.default_rng(0)
        x = rng.integers(-126, 127, size=(5, 32)).astype(np.float32)
        x[:, 0] = 127.0  # per-row absmax exactly 127 -> scale 1.0, lossless
        wq = rng.integers(-127, 128, size=(32, 16)).astype(np.int8)
        sw = (rng.random(16) + 0.5).astype(np.float32)
        got = w8a8_matmul(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(sw),
                          out_dtype=jnp.float32)
        # per-row scale = absmax/127; x/s then rounds back to exact ints
        want = (x @ wq.astype(np.float32)) * sw
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)

    def test_quantize_rows_bounds(self):
        x = jnp.asarray(np.random.default_rng(1).normal(size=(7, 64)),
                        jnp.float32)
        xq, sx = quantize_rows(x)
        assert xq.dtype == jnp.int8 and sx.shape == (7, 1)
        back = np.asarray(xq, np.float32) * np.asarray(sx)
        err = np.abs(back - np.asarray(x)).max()
        assert err <= np.asarray(sx).max() * 0.5 + 1e-6

    def test_relative_error_bounded(self):
        rng = np.random.default_rng(2)
        x = rng.normal(size=(16, 128)).astype(np.float32)
        w = rng.normal(size=(128, 64)).astype(np.float32) * 0.05
        absmax = np.abs(w).max(axis=0)
        sw = absmax / 127.0
        wq = np.clip(np.round(w / sw), -127, 127).astype(np.int8)
        got = np.asarray(
            w8a8_matmul(jnp.asarray(x), jnp.asarray(wq), jnp.asarray(sw),
                        out_dtype=jnp.float32)
        )
        want = x @ w
        rel = np.abs(got - want).mean() / np.abs(want).mean()
        assert rel < 2e-2, rel

    def test_head_major_matches_standard(self):
        rng = np.random.default_rng(3)
        b, s, c, h = 2, 6, 32, 4
        n = 24  # h * d, d = 6
        x = rng.normal(size=(b, s, c)).astype(np.float32)
        wq = rng.integers(-127, 128, size=(c, n)).astype(np.int8)
        sw = (rng.random(n) + 0.5).astype(np.float32)
        bias = rng.normal(size=n).astype(np.float32)
        std = np.asarray(w8a8_matmul(
            jnp.asarray(x), jnp.asarray(wq), jnp.asarray(sw),
            bias=jnp.asarray(bias), out_dtype=jnp.float32,
        ))  # [B, S, N]
        hm = np.asarray(w8a8_head_major(
            jnp.asarray(x), jnp.asarray(wq), jnp.asarray(sw), heads=h,
            bias=jnp.asarray(bias), out_dtype=jnp.float32,
        ))  # [B, H, S, D]
        want = std.reshape(b, s, h, n // h).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(hm, want, rtol=1e-5, atol=1e-5)

    def test_motion_pointwise_w8a8_matches_bf16(self):
        """Opt-in int8 SlowFast pointwise convs (Precision.w8a8_motion;
        default OFF — measured slower than bf16 on v5e, BENCH_NOTES round
        5): same params, close outputs, identical param tree."""
        from aigv_assessor_tpu.models.motion import ConvBN

        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 16)), jnp.float32)
        ref = ConvBN(24, (1, 1, 1), strides=(1, 2, 2), use_relu=False,
                     dtype=jnp.float32, w8a8=False)
        qnt = ConvBN(24, (1, 1, 1), strides=(1, 2, 2), use_relu=False,
                     dtype=jnp.float32, w8a8=True)
        params = ref.init(jax.random.key(0), x)
        assert jax.tree_util.tree_structure(
            params
        ) == jax.tree_util.tree_structure(qnt.init(jax.random.key(0), x))
        y_ref = np.asarray(ref.apply(params, x))
        y_q = np.asarray(qnt.apply(params, x))
        assert y_q.shape == y_ref.shape == (2, 4, 4, 4, 24)
        rel = np.abs(y_q - y_ref).mean() / (np.abs(y_ref).mean() + 1e-9)
        assert rel < 2e-2, rel

    def test_head_major_in_matches_standard(self):
        rng = np.random.default_rng(4)
        b, h, s, d, n = 2, 4, 6, 8, 16
        x = rng.normal(size=(b, h, s, d)).astype(np.float32)
        wq = rng.integers(-127, 128, size=(h * d, n)).astype(np.int8)
        sw = (rng.random(n) + 0.5).astype(np.float32)
        hm = np.asarray(w8a8_head_major_in(
            jnp.asarray(x), jnp.asarray(wq), jnp.asarray(sw),
            out_dtype=jnp.float32,
        ))
        x_std = x.transpose(0, 2, 1, 3).reshape(b, s, h * d)
        std = np.asarray(w8a8_matmul(
            jnp.asarray(x_std), jnp.asarray(wq), jnp.asarray(sw),
            out_dtype=jnp.float32,
        ))
        np.testing.assert_allclose(hm, std, rtol=1e-5, atol=1e-5)


class TestServing:
    """quantize_for_serving(w8a8=True) over the composite model."""

    @pytest.fixture(scope="class")
    def stack(self):
        from aigv_assessor_tpu.core.config import AssessorConfig
        from aigv_assessor_tpu.core.precision import Precision
        from aigv_assessor_tpu.models.assessor import AIGVAssessor

        cfg = AssessorConfig.tiny().replace(stage=2)
        fp = Precision.fp32()
        model = AIGVAssessor(cfg, fp)
        ids = np.full((1, 40), 5, np.int32)
        n_img = cfg.num_image_token * 2 + 1
        ids[0, 3 : 3 + n_img] = cfg.img_context_token_id
        px = np.asarray(
            np.random.default_rng(0).random((1, 4, 32, 32, 3)), np.float32
        )
        params = model.init(
            jax.random.key(0), jnp.asarray(ids), jnp.asarray(px)
        )
        return cfg, model, params, ids, px

    def test_quantize_for_serving_w8a8(self, stack):
        from aigv_assessor_tpu.core.precision import Precision
        from aigv_assessor_tpu.models.assessor import AIGVAssessor
        from aigv_assessor_tpu.models.loading import quantize_for_serving

        cfg, model, params, ids, px = stack
        host = jax.tree_util.tree_map(np.asarray, params)
        qparams, prec = quantize_for_serving(
            host, Precision.fp32(), w8a8=True
        )
        assert prec.w8a8 and not prec.int8_weights
        flat = traverse_util.flatten_dict(qparams)
        keys = {"/".join(map(str, k)) for k in flat}
        # both towers quantized, LM head NOT (fp32 logits parity)
        assert any(
            k.startswith("params/vision_model") and k.endswith("kernel_int8")
            for k in keys
        )
        assert any(
            k.startswith("params/language_model") and k.endswith("kernel_int8")
            for k in keys
        )
        assert "params/language_model/output/kernel" in keys
        # projector/score heads stay float
        assert not any("mlp1" in k and "int8" in k for k in keys)
        assert not any("mlpscore" in k and "int8" in k for k in keys)

        qmodel = AIGVAssessor(cfg, prec)
        out = qmodel.apply(
            qparams, jnp.asarray(ids), jnp.asarray(px), with_logits=False
        )
        base = model.apply(
            params, jnp.asarray(ids), jnp.asarray(px), with_logits=False
        )
        s_q = np.asarray(out["score"])
        s_b = np.asarray(base["score"])
        assert np.isfinite(s_q).all()
        # random-init tiny model: require close hidden states, bounded score
        # drift (tiny width-32/64 contractions are the int8 worst case —
        # measured 0.028 max drift at seed 0; rank-order invariance at
        # serving-relevant widths is asserted by TestQualityGate below and
        # on-chip by bench.py's w8a8_srcc gate)
        h_q = np.asarray(out["hidden"], np.float32).ravel()
        h_b = np.asarray(base["hidden"], np.float32).ravel()
        cos = h_q @ h_b / (np.linalg.norm(h_q) * np.linalg.norm(h_b) + 1e-9)
        assert cos > 0.99, cos
        assert np.abs(s_q - s_b).max() <= max(0.06, 0.1 * np.abs(s_b).max())

    def test_srcc_rank_invariance_64_videos(self):
        """Metric-level quantization gate (round-5 verdict task 2): scores
        from the W8A8 pipeline must preserve the bf16 pipeline's RANKING
        over a 64-video synthetic eval set, and must not shift the
        correlation against ground-truth mos.

        Width-256 model (wider than tiny: int8 error averages over the
        contraction dim, and serving widths are 2048-4096 — this is the
        conservative small end; measured SRCC here 0.992, srcc-vs-mos
        delta 0.0013 at seed 7). The serving-scale (K=2048) version of this
        gate runs on-chip in bench.py (`w8a8_srcc`, `w8a8_srcc_delta`,
        thresholds 0.995/0.005 per the reference metric protocol,
        `/root/reference/internvl/train/internvl/eval/stage2_eval.py:676-685`)."""
        import dataclasses

        from scipy.stats import spearmanr

        from aigv_assessor_tpu.core.config import (
            AssessorConfig,
            LLMConfig,
            VisionConfig,
        )
        from aigv_assessor_tpu.core.precision import Precision
        from aigv_assessor_tpu.models.assessor import AIGVAssessor
        from aigv_assessor_tpu.models.loading import quantize_for_serving

        cfg = AssessorConfig.tiny().replace(
            stage=2,
            llm=dataclasses.replace(
                LLMConfig.tiny(), hidden_size=256, intermediate_size=512,
                num_attention_heads=4, num_key_value_heads=2,
            ),
            vision=dataclasses.replace(
                VisionConfig.tiny(), hidden_size=128, intermediate_size=256
            ),
        )
        fp = Precision.fp32()
        model = AIGVAssessor(cfg, fp)
        ids = np.full((1, 40), 5, np.int32)
        n_img = cfg.num_image_token * 2 + 1
        ids[0, 3 : 3 + n_img] = cfg.img_context_token_id
        px0 = np.asarray(
            np.random.default_rng(0).random((1, 4, 32, 32, 3)), np.float32
        )
        params = model.init(
            jax.random.key(0), jnp.asarray(ids), jnp.asarray(px0)
        )
        # spread the (random-init, final-ReLU) score head so scores vary
        # across inputs — rank invariance is meaningless on a constant
        flat = traverse_util.flatten_dict(
            jax.tree_util.tree_map(np.asarray, params)
        )
        for k in list(flat):
            if "mlpscore" in map(str, k) and str(k[-1]) == "kernel":
                flat[k] = flat[k] * 3.0
        params = traverse_util.unflatten_dict(flat)
        qparams, prec = quantize_for_serving(
            jax.tree_util.tree_map(np.asarray, params),
            Precision.fp32(), w8a8=True,
        )
        qmodel = AIGVAssessor(cfg, prec)

        n, bs = 64, 8
        rng = np.random.default_rng(7)
        px = jnp.asarray(rng.random((n, 4, 32, 32, 3)), jnp.float32)
        ids_b = jnp.asarray(np.tile(ids, (bs, 1)))
        fb = jax.jit(
            lambda p, i, x: model.apply(p, i, x, with_logits=False)["score"]
        )
        fq = jax.jit(
            lambda p, i, x: qmodel.apply(p, i, x, with_logits=False)["score"]
        )
        s_b, s_q = [], []
        for i in range(0, n, bs):
            s_b.append(np.asarray(fb(params, ids_b, px[i : i + bs])))
            s_q.append(np.asarray(fq(qparams, ids_b, px[i : i + bs])))
        s_b, s_q = np.concatenate(s_b), np.concatenate(s_q)
        assert s_b.std() > 1e-3, "degenerate scores; gate is meaningless"

        srcc = spearmanr(s_b, s_q).statistic
        assert srcc >= 0.98, srcc
        # synthetic ground truth rank-correlated with the bf16 scores:
        # the quantized pipeline must predict it equally well
        mos = s_b + rng.normal(size=n) * 0.5 * s_b.std()
        d = abs(
            spearmanr(s_b, mos).statistic - spearmanr(s_q, mos).statistic
        )
        assert d <= 0.01, d

    def test_w8a8_on_mesh(self, stack):
        """Sharded scoring with w8a8 params (GSPMD partitions the int8
        kernels like any other)."""
        from aigv_assessor_tpu.core.mesh import MeshConfig, make_mesh
        from aigv_assessor_tpu.core.precision import Precision
        from aigv_assessor_tpu.models.assessor import AIGVAssessor
        from aigv_assessor_tpu.models.loading import (
            quantize_for_serving,
            shard_for_inference,
        )

        if jax.device_count() < 2:
            pytest.skip("needs >=2 devices")
        cfg, model, params, ids, px = stack
        host = jax.tree_util.tree_map(np.asarray, params)
        qparams, prec = quantize_for_serving(host, Precision.fp32(), w8a8=True)
        qmodel = AIGVAssessor(cfg, prec)
        unsharded = np.asarray(
            qmodel.apply(
                qparams, jnp.asarray(ids), jnp.asarray(px), with_logits=False
            )["score"]
        )
        mesh, sharded = shard_for_inference(
            qparams, mesh_config=MeshConfig(data=1, fsdp=jax.device_count())
        )
        with mesh:
            out = qmodel.apply(
                sharded, jnp.asarray(ids), jnp.asarray(px), with_logits=False
            )
        np.testing.assert_allclose(
            np.asarray(out["score"]), unsharded, rtol=1e-4, atol=1e-4
        )

"""Multi-perspective fused scoring (VERDICT r2 next-round #1).

`AIGVAssessor.score_perspectives` must produce, for every perspective
prompt, EXACTLY the score the plain stage-2 forward produces when that
prompt is run alone — the fusion shares the ViT/motion encode, it must not
change the numbers.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aigv_assessor_tpu.core.config import AssessorConfig
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.assessor import AIGVAssessor


class TestScorePerspectives:
    def _setup(self):
        cfg = AssessorConfig.tiny(stage=2).replace(img_context_token_id=4)
        model = AIGVAssessor(cfg, Precision.fp32())
        b, p, t, seq = 2, 3, 4, 64
        rng = np.random.default_rng(0)
        n_ctx = t * cfg.num_image_token + 1
        ids = rng.integers(5, cfg.llm.vocab_size, (b, p, seq))
        ids[:, :, 1 : 1 + n_ctx] = cfg.img_context_token_id
        mask = np.ones((b, p, seq), bool)
        # ragged perspective lengths: perspective j loses j trailing tokens
        for j in range(p):
            if j:
                mask[:, j, -j:] = False
                ids[:, j, -j:] = 0
        px = rng.normal(size=(b, t, 56, 56, 3)).astype(np.float32)
        params = model.init(
            jax.random.key(0),
            jnp.asarray(ids[:, 0]),
            jnp.asarray(px),
            mos=jnp.zeros((b,)),
        )
        return cfg, model, params, ids, mask, px

    def test_matches_single_prompt_forward(self):
        cfg, model, params, ids, mask, px = self._setup()
        b, p, seq = ids.shape

        fused = model.apply(
            params,
            jnp.asarray(ids),
            jnp.asarray(px),
            jnp.asarray(mask),
            method="score_perspectives",
        )
        assert fused.shape == (b, p)

        for j in range(p):
            out = model.apply(
                params,
                jnp.asarray(ids[:, j]),
                jnp.asarray(px),
                attention_mask=jnp.asarray(mask[:, j]),
                with_logits=False,
            )
            np.testing.assert_allclose(
                np.asarray(fused[:, j]), np.asarray(out["score"]),
                rtol=1e-5, atol=1e-5,
                err_msg=f"perspective {j} drifted from the single-prompt path",
            )

    def _setup_shared_prefix(self, backbone="internlm2"):
        """Perspective prompts sharing a real common prefix (system + all
        IMG_CONTEXT slots), diverging only in the 'question' tail — the
        structure the score CLI produces."""
        cfg = AssessorConfig.tiny(stage=2).replace(img_context_token_id=4)
        if backbone == "phi3":
            from aigv_assessor_tpu.models.phi3 import Phi3Config

            cfg = cfg.replace(llm=Phi3Config.tiny())
        model = AIGVAssessor(cfg, Precision.fp32())
        b, p, t, seq = 2, 3, 4, 64
        rng = np.random.default_rng(7)
        n_ctx = t * cfg.num_image_token + 1
        prefix_len = 2 + n_ctx + 3  # bos-ish + context tokens + a few shared
        ids = rng.integers(5, cfg.llm.vocab_size, (b, p, seq))
        shared = rng.integers(5, cfg.llm.vocab_size, (b, prefix_len))
        ids[:, :, :prefix_len] = shared[:, None, :]
        ids[:, :, 1 : 1 + n_ctx] = cfg.img_context_token_id
        mask = np.ones((b, p, seq), bool)
        for j in range(p):  # ragged suffix lengths
            if j:
                mask[:, j, -j:] = False
                ids[:, j, -j:] = 0
        px = rng.normal(size=(b, t, 56, 56, 3)).astype(np.float32)
        params = model.init(
            jax.random.key(0),
            jnp.asarray(ids[:, 0]),
            jnp.asarray(px),
            mos=jnp.zeros((b,)),
        )
        return cfg, model, params, ids, mask, px, prefix_len

    @pytest.mark.parametrize("backbone", ["internlm2", "phi3"])
    def test_shared_prefix_matches_plain_fused(self, backbone):
        """One prefix prefill + block-causal suffixes == P independent runs."""
        cfg, model, params, ids, mask, px, prefix_len = self._setup_shared_prefix(
            backbone
        )
        plain = model.apply(
            params, jnp.asarray(ids), jnp.asarray(px), jnp.asarray(mask),
            method="score_perspectives",
        )
        shared = model.apply(
            params, jnp.asarray(ids), jnp.asarray(px), jnp.asarray(mask),
            method="score_perspectives", shared_prefix_len=prefix_len,
        )
        assert shared.shape == plain.shape
        np.testing.assert_allclose(
            np.asarray(shared), np.asarray(plain), rtol=1e-4, atol=1e-4,
            err_msg="shared-prefix KV path drifted from the plain fused path",
        )

    def test_shared_prefix_matches_single_prompt_forward(self):
        cfg, model, params, ids, mask, px, prefix_len = self._setup_shared_prefix()
        b, p, seq = ids.shape
        shared = model.apply(
            params, jnp.asarray(ids), jnp.asarray(px), jnp.asarray(mask),
            method="score_perspectives", shared_prefix_len=prefix_len,
        )
        for j in range(p):
            out = model.apply(
                params, jnp.asarray(ids[:, j]), jnp.asarray(px),
                attention_mask=jnp.asarray(mask[:, j]), with_logits=False,
            )
            np.testing.assert_allclose(
                np.asarray(shared[:, j]), np.asarray(out["score"]),
                rtol=1e-4, atol=1e-4,
                err_msg=f"perspective {j} drifted from the single-prompt path",
            )

    def test_shared_prefix_int4_serving(self):
        """Shared-prefix scoring composes with W4A16 quantized serving (the
        suffix pass runs the int4 cache branch)."""
        from aigv_assessor_tpu.models.loading import quantize_for_serving

        cfg, model, params, ids, mask, px, prefix_len = self._setup_shared_prefix()
        ref = model.apply(
            params, jnp.asarray(ids), jnp.asarray(px), jnp.asarray(mask),
            method="score_perspectives", shared_prefix_len=prefix_len,
        )
        qparams, prec = quantize_for_serving(params, model.precision, int4=True)
        qmodel = AIGVAssessor(cfg, prec)
        got = qmodel.apply(
            qparams, jnp.asarray(ids), jnp.asarray(px), jnp.asarray(mask),
            method="score_perspectives", shared_prefix_len=prefix_len,
        )
        assert got.shape == ref.shape
        assert np.all(np.isfinite(np.asarray(got)))
        # int4 weights shift the numbers; scores must stay in the same range
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=0.3, atol=0.15
        )

    def test_jit_and_finite(self):
        cfg, model, params, ids, mask, px = self._setup()
        fn = jax.jit(
            lambda pr, i, x, m: model.apply(
                pr, i, x, m, method="score_perspectives"
            )
        )
        s = fn(params, jnp.asarray(ids), jnp.asarray(px), jnp.asarray(mask))
        assert np.all(np.isfinite(np.asarray(s)))


@pytest.mark.slow
def test_score_cli_multi_perspective(tmp_path):
    import csv
    import json as _json

    from PIL import Image

    vids = tmp_path / "videos"
    vids.mkdir()
    rng = np.random.default_rng(0)
    for i in range(5):
        frames = [
            Image.new("RGB", (64, 48), (int(rng.integers(0, 255)), 30, 60))
            for _ in range(6)
        ]
        frames[0].save(
            vids / f"clip{i}.gif", save_all=True, append_images=frames[1:],
            duration=100,
        )

    from aigv_assessor_tpu.cli import score

    out = tmp_path / "scores.csv"
    rows = score.main(
        [
            "--model_scale", "tiny", "--videos", str(vids),
            "--question", "How would you rate the static quality of this video?",
            "--question", "How would you rate the temporal smoothness of this video?",
            "--batch_size", "2", "--num_segments", "4", "--bf16", "False",
            "--max_seq_length", "512", "--out", str(out), "--workers", "2",
        ]
    )
    assert len(rows) == 5
    assert all(len(r) == 3 for r in rows)  # path + 2 perspective scores
    assert all(np.isfinite(r[1]) and np.isfinite(r[2]) for r in rows)
    with open(out) as f:
        header = next(csv.reader(f))
    assert header == ["video_name", "pred_score_1", "pred_score_2"]


class TestShardedPerspectiveServing:
    """BASELINE config #3 multi-chip serving analog on the virtual 8-device
    mesh: params laid out by `shard_for_inference` (training sharding
    rules), the video batch data-parallel over (data, fsdp), and the fused
    perspective scorer jitted over the mesh — scores must match the
    unsharded run exactly."""

    def test_scores_match_unsharded(self):
        from aigv_assessor_tpu.core.mesh import MeshConfig
        from aigv_assessor_tpu.models.loading import shard_for_inference
        from aigv_assessor_tpu.parallel.sharding import shard_batch

        if jax.device_count() < 8:
            pytest.skip("needs the 8-device virtual mesh")

        cfg = AssessorConfig.tiny(stage=2).replace(img_context_token_id=4)
        model = AIGVAssessor(cfg, Precision.fp32())
        b, p, t, seq = 8, 2, 4, 64
        rng = np.random.default_rng(1)
        n_ctx = t * cfg.num_image_token + 1
        ids = rng.integers(5, cfg.llm.vocab_size, (b, p, seq))
        ids[:, :, 1 : 1 + n_ctx] = cfg.img_context_token_id
        mask = np.ones((b, p, seq), bool)
        px = rng.normal(size=(b, t, 56, 56, 3)).astype(np.float32)
        params = model.init(
            jax.random.key(0),
            jnp.asarray(ids[:, 0]),
            jnp.asarray(px),
            mos=jnp.zeros((b,)),
        )

        ref = np.asarray(
            model.apply(
                params, jnp.asarray(ids), jnp.asarray(px), jnp.asarray(mask),
                method="score_perspectives",
            )
        )

        mesh, sharded = shard_for_inference(
            params, mesh_config=MeshConfig(data=4, fsdp=2, tensor=1)
        )
        with mesh:
            batch = shard_batch(
                {
                    "ids": jnp.asarray(ids),
                    "px": jnp.asarray(px),
                    "mask": jnp.asarray(mask),
                },
                mesh,
            )
            fn = jax.jit(
                lambda pr, i, x, m: model.apply(
                    pr, i, x, m, method="score_perspectives"
                )
            )
            got = np.asarray(fn(sharded, batch["ids"], batch["px"], batch["mask"]))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_shared_prefix_scores_match_unsharded(self):
        """The shared-prefix KV path (captured cache + block-causal suffixes)
        must also run under GSPMD on the virtual mesh and match exactly."""
        from aigv_assessor_tpu.core.mesh import MeshConfig
        from aigv_assessor_tpu.models.loading import shard_for_inference
        from aigv_assessor_tpu.parallel.sharding import shard_batch

        if jax.device_count() < 8:
            pytest.skip("needs the 8-device virtual mesh")

        cfg = AssessorConfig.tiny(stage=2).replace(img_context_token_id=4)
        model = AIGVAssessor(cfg, Precision.fp32())
        b, p, t, seq = 8, 2, 4, 64
        rng = np.random.default_rng(3)
        n_ctx = t * cfg.num_image_token + 1
        prefix_len = 2 + n_ctx + 3
        ids = rng.integers(5, cfg.llm.vocab_size, (b, p, seq))
        shared = rng.integers(5, cfg.llm.vocab_size, (b, prefix_len))
        ids[:, :, :prefix_len] = shared[:, None, :]
        ids[:, :, 1 : 1 + n_ctx] = cfg.img_context_token_id
        mask = np.ones((b, p, seq), bool)
        px = rng.normal(size=(b, t, 56, 56, 3)).astype(np.float32)
        params = model.init(
            jax.random.key(0), jnp.asarray(ids[:, 0]), jnp.asarray(px),
            mos=jnp.zeros((b,)),
        )
        ref = np.asarray(
            model.apply(
                params, jnp.asarray(ids), jnp.asarray(px), jnp.asarray(mask),
                method="score_perspectives", shared_prefix_len=prefix_len,
            )
        )
        mesh, sharded = shard_for_inference(
            params, mesh_config=MeshConfig(data=4, fsdp=2, tensor=1)
        )
        with mesh:
            batch = shard_batch(
                {
                    "ids": jnp.asarray(ids),
                    "px": jnp.asarray(px),
                    "mask": jnp.asarray(mask),
                },
                mesh,
            )
            fn = jax.jit(
                lambda pr, i, x, m: model.apply(
                    pr, i, x, m, method="score_perspectives",
                    shared_prefix_len=prefix_len,
                )
            )
            got = np.asarray(fn(sharded, batch["ids"], batch["px"], batch["mask"]))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

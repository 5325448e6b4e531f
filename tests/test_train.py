"""Training-loop tests: overfit a single batch (loss must drop), freeze
masks, LoRA-only updates, checkpoint round-trip."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from aigv_assessor_tpu.core.config import AssessorConfig
from aigv_assessor_tpu.core.mesh import MeshConfig, make_mesh
from aigv_assessor_tpu.core.precision import Precision
from aigv_assessor_tpu.models.assessor import AIGVAssessor
from aigv_assessor_tpu.train.freeze import count_params, make_trainable_mask
from aigv_assessor_tpu.train.trainer import TrainConfig, Trainer, microbatch

FP32 = Precision.fp32()


def make_batch(cfg, b=2, frames=4, seq=96, seed=0):
    rng = np.random.default_rng(seed)
    n_ctx = frames * cfg.num_image_token + 1
    ids = rng.integers(5, cfg.llm.vocab_size, (b, seq))
    ids[:, 2 : 2 + n_ctx] = cfg.img_context_token_id
    labels = np.full((b, seq), -100)
    labels[:, -8:] = rng.integers(5, cfg.llm.vocab_size, (b, 8))
    pixels = rng.normal(size=(b, frames, 56, 56, 3)).astype(np.float32)
    mos = rng.uniform(0, 1, (b,)).astype(np.float32)
    mask = np.ones((b, seq), bool)
    return {
        "input_ids": ids.astype(np.int32),
        "labels": labels.astype(np.int32),
        "attention_mask": mask,
        "pixel_values": pixels,
        "mos": mos,
        "image_flags": np.ones((b, frames), np.int32),
    }


class TestFreezeMasks:
    def test_stage1_trainable_set(self):
        cfg = AssessorConfig.tiny(stage=1).replace(img_context_token_id=4)
        model = AIGVAssessor(cfg, FP32)
        b = make_batch(cfg)
        params = model.init(
            jax.random.key(0), jnp.asarray(b["input_ids"]), jnp.asarray(b["pixel_values"])
        )
        mask = make_trainable_mask(params, stage=1)
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        for path, m in flat:
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            if "mlp1" in p or "motion_mlp" in p:
                assert m, p
            else:
                assert not m, p

    def test_stage2_trainable_set(self):
        cfg = AssessorConfig.tiny(stage=2).replace(
            img_context_token_id=4, use_backbone_lora=4, use_llm_lora=4
        )
        model = AIGVAssessor(cfg, FP32)
        b = make_batch(cfg)
        params = model.init(
            jax.random.key(0),
            jnp.asarray(b["input_ids"]),
            jnp.asarray(b["pixel_values"]),
            mos=jnp.asarray(b["mos"]),
        )
        mask = make_trainable_mask(params, stage=2)
        flat = jax.tree_util.tree_flatten_with_path(mask)[0]
        for path, m in flat:
            p = "/".join(str(getattr(k, "key", k)) for k in path)
            if "lora_a" in p or "lora_b" in p or "mlpscore" in p:
                assert m, p
            else:
                assert not m, p
        counts = count_params(params, mask)
        assert 0 < counts["trainable"] < counts["total"]


class TestOverfit:
    @pytest.mark.slow
    def test_stage1_loss_decreases(self):
        """Single-batch overfit: trainable mlp1/motion_mlp must be able to
        reduce the CE loss (end-to-end gradient sanity)."""
        cfg = AssessorConfig.tiny(stage=1).replace(img_context_token_id=4)
        model = AIGVAssessor(cfg, FP32)
        batch = make_batch(cfg, b=2, seq=96)
        mesh = make_mesh(MeshConfig(data=1, fsdp=1))
        tcfg = TrainConfig(
            learning_rate=3e-3,
            warmup_ratio=0.0,
            lr_scheduler_type="constant",
            grad_checkpoint=False,
            output_dir="/tmp/aigv_test_overfit",
        )
        params = model.init(
            jax.random.key(0),
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["pixel_values"]),
            labels=jnp.asarray(batch["labels"]),
        )
        trainer = Trainer(model, params, tcfg, total_steps=30, mesh=mesh)
        step = trainer.compiled_step()
        mb = microbatch(batch, 1)
        losses = []
        rng = jax.random.key(0)
        with mesh:
            for i in range(25):
                rng, sub = jax.random.split(rng)
                trainer.state, loss = step(trainer.state, mb, sub)
                losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, losses

    @pytest.mark.slow
    def test_stage2_score_overfit(self):
        """LoRA + mlpscore stage-2: L1(score, mos) must drop on one batch."""
        cfg = AssessorConfig.tiny(stage=2).replace(
            img_context_token_id=4, use_backbone_lora=2, use_llm_lora=2
        )
        model = AIGVAssessor(cfg, FP32)
        batch = make_batch(cfg, b=2, seq=96)
        mesh = make_mesh(MeshConfig(data=1, fsdp=1))
        tcfg = TrainConfig(
            learning_rate=1e-3,
            warmup_ratio=0.0,
            lr_scheduler_type="constant",
            grad_checkpoint=False,
            output_dir="/tmp/aigv_test_overfit2",
        )
        params = model.init(
            jax.random.key(0),
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["pixel_values"]),
            labels=jnp.asarray(batch["labels"]),
            mos=jnp.asarray(batch["mos"]),
        )
        trainer = Trainer(model, params, tcfg, total_steps=30, mesh=mesh)
        step = trainer.compiled_step()
        mb = microbatch(batch, 1)
        losses = []
        rng = jax.random.key(1)
        with mesh:
            for i in range(25):
                rng, sub = jax.random.split(rng)
                trainer.state, loss = step(trainer.state, mb, sub)
                losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.7, losses

    def test_frozen_params_unchanged(self):
        cfg = AssessorConfig.tiny(stage=1).replace(img_context_token_id=4)
        model = AIGVAssessor(cfg, FP32)
        batch = make_batch(cfg)
        mesh = make_mesh(MeshConfig(data=1, fsdp=1))
        tcfg = TrainConfig(
            learning_rate=1e-2, warmup_ratio=0.0, lr_scheduler_type="constant",
            grad_checkpoint=False, output_dir="/tmp/aigv_test_frozen",
        )
        params = model.init(
            jax.random.key(0),
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["pixel_values"]),
            labels=jnp.asarray(batch["labels"]),
        )
        before = jax.tree_util.tree_map(np.asarray, params)
        trainer = Trainer(model, params, tcfg, total_steps=5, mesh=mesh)
        step = trainer.compiled_step()
        with mesh:
            trainer.state, _ = step(
                trainer.state, microbatch(batch, 1), jax.random.key(2)
            )
        after = jax.device_get(trainer.state.params)
        # LLM weights frozen
        np.testing.assert_array_equal(
            before["params"]["language_model"]["layers"]["attention"]["wqkv"]["base"]["kernel"],
            after["params"]["language_model"]["layers"]["attention"]["wqkv"]["base"]["kernel"],
        )
        # mlp1 updated
        assert not np.allclose(
            before["params"]["mlp1"]["fc1"]["kernel"],
            after["params"]["mlp1"]["fc1"]["kernel"],
        )


class TestCheckpoint:
    def test_lora_save_load_roundtrip(self, tmp_path):
        from aigv_assessor_tpu.train.checkpoint import (
            load_lora_weights,
            save_lora_weights,
        )

        cfg = AssessorConfig.tiny(stage=2).replace(
            img_context_token_id=4, use_backbone_lora=2, use_llm_lora=2
        )
        model = AIGVAssessor(cfg, FP32)
        b = make_batch(cfg)
        params = model.init(
            jax.random.key(0),
            jnp.asarray(b["input_ids"]),
            jnp.asarray(b["pixel_values"]),
            mos=jnp.asarray(b["mos"]),
        )
        path = str(tmp_path / "lora.msgpack")
        save_lora_weights(path, params)
        # perturb lora_a, then restore
        import flax

        flat = flax.traverse_util.flatten_dict(params)
        key = next(k for k in flat if "lora_a" in k)
        orig = np.asarray(flat[key])
        flat[key] = flat[key] + 1.0
        perturbed = flax.traverse_util.unflatten_dict(flat)
        restored = load_lora_weights(path, perturbed)
        rflat = flax.traverse_util.flatten_dict(restored)
        np.testing.assert_array_equal(np.asarray(rflat[key]), orig)


class TestRemat:
    def test_remat_grads_match(self):
        """Per-layer remat must not change gradients, only memory."""
        cfg = AssessorConfig.tiny(stage=1).replace(img_context_token_id=4)
        batch = make_batch(cfg, b=1, frames=4, seq=64)
        args = (
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["pixel_values"]),
            jnp.asarray(batch["labels"]),
        )
        m0 = AIGVAssessor(cfg, FP32, remat=False)
        m1 = AIGVAssessor(cfg, FP32, remat=True)
        params = m0.init(jax.random.key(0), args[0], args[1], labels=args[2])

        def loss(m, p):
            return m.apply(p, args[0], args[1], labels=args[2])["loss"]

        g0 = jax.grad(lambda p: loss(m0, p))(params)
        g1 = jax.grad(lambda p: loss(m1, p))(params)
        for a, b in zip(
            jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestCheckpointManager:
    def test_save_restore_roundtrip(self, tmp_path):
        from aigv_assessor_tpu.train.checkpoint import CheckpointManager
        from aigv_assessor_tpu.train.trainer import TrainState

        state = TrainState(
            params={"w": jnp.arange(6.0).reshape(2, 3)},
            opt_state={"m": jnp.ones((2, 3))},
            step=jnp.asarray(7, jnp.int32),
        )
        mgr = CheckpointManager(str(tmp_path / "ck"), save_total_limit=2)
        mgr.save(7, state)
        mgr.save(8, TrainState(
            params={"w": jnp.zeros((2, 3))},
            opt_state={"m": jnp.zeros((2, 3))},
            step=jnp.asarray(8, jnp.int32),
        ), best=True)
        assert mgr.latest_step() == 8
        template = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = mgr.restore(template, step=7)
        np.testing.assert_array_equal(
            np.asarray(restored.params["w"]), np.arange(6.0).reshape(2, 3)
        )
        assert int(restored.step) == 7
        best = mgr.restore_best(template)
        assert int(best.step) == 8
        mgr.close()


class TestTrainerCheckpointIntegration:
    def test_trainer_state_orbax_roundtrip(self, tmp_path):
        """The partitioned opt_state (nested subset tree) must survive an
        orbax save/restore."""
        from aigv_assessor_tpu.train.checkpoint import CheckpointManager

        cfg = AssessorConfig.tiny(stage=1).replace(img_context_token_id=4)
        model = AIGVAssessor(cfg, FP32)
        batch = make_batch(cfg, b=1, frames=4, seq=64)
        mesh = make_mesh(MeshConfig(1, 1, 1))
        tcfg = TrainConfig(
            learning_rate=1e-3, warmup_ratio=0.0, lr_scheduler_type="constant",
            grad_checkpoint=False, output_dir=str(tmp_path),
        )
        params = model.init(
            jax.random.key(0),
            jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["pixel_values"]),
            labels=jnp.asarray(batch["labels"]),
        )
        trainer = Trainer(model, params, tcfg, total_steps=3, mesh=mesh)
        step = trainer.compiled_step()
        with mesh:
            trainer.state, _ = step(
                trainer.state, microbatch(batch, 1), jax.random.key(1)
            )
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(1, trainer.state)
        template = jax.tree_util.tree_map(np.zeros_like, jax.device_get(trainer.state))
        restored = mgr.restore(template)
        assert int(restored.step) == 1
        # params and opt_state content preserved
        a = jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))
        b = jax.tree_util.tree_leaves(restored.params)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        mgr.close()

"""Worker for the true multi-process per-host-loading test.

Launched twice by tests/test_multiprocess.py with argv:
    _mp_worker.py <process_id> <coordinator_port>

Each process owns 4 virtual CPU devices (XLA_FLAGS set by the parent), so
the pair forms a 2x2x2 global mesh. The worker loads ONLY its own shard of
the global batch (ShardedBatchSampler) and runs one sharded train step —
`shard_batch` assembles the global arrays with
`jax.make_array_from_process_local_data` (the BASELINE #5 / v5p-32 code
path) because `jax.process_count() == 2` here, not simulated.
"""

import sys

import numpy as np


def sample_for_index(idx: int, cfg):
    """Deterministic per-index sample so both processes, holding disjoint
    shards, assemble a coherent global batch."""
    rng = np.random.default_rng(1000 + idx)
    frames, seq = 4, 96
    n_ctx = frames * cfg.num_image_token + 1
    ids = rng.integers(5, cfg.llm.vocab_size, (seq,))
    ids[2 : 2 + n_ctx] = cfg.img_context_token_id
    labels = np.full((seq,), -100)
    labels[-8:] = rng.integers(5, cfg.llm.vocab_size, (8,))
    return {
        "input_ids": ids.astype(np.int32),
        "pixel_values": rng.normal(size=(frames, 56, 56, 3)).astype(np.float32),
        "labels": labels.astype(np.int32),
        "attention_mask": np.ones((seq,), bool),
        "mos": np.float32(rng.uniform(0, 1)),
    }


def run_resume(pid: int, port: str, mode: str, ckpt_dir: str):
    """Multi-process orbax save -> restart -> restore -> continue (the
    v5p-32 FSDP resume contract; reference HF `get_last_checkpoint`,
    `stage1_train.py:771-783`).

    mode='chain_save': train 2 steps, orbax-save the sharded TrainState
    (every process participates), train step 3 uninterrupted, print all
    three losses.
    mode='resume': fresh processes restore the step-2 state into the
    sharded template and run step 3; its loss must equal chain_save's
    third loss exactly.
    """
    import jax

    from aigv_assessor_tpu.core.dist import init_dist

    init_dist(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2 and jax.device_count() == 8

    from __graft_entry__ import _tiny_setup

    from aigv_assessor_tpu.core.mesh import MeshConfig, make_mesh
    from aigv_assessor_tpu.data.sampler import ShardedBatchSampler
    from aigv_assessor_tpu.parallel.sharding import shard_batch
    from aigv_assessor_tpu.train.checkpoint import CheckpointManager
    from aigv_assessor_tpu.train.trainer import TrainConfig, Trainer, microbatch

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    cfg, model, params, _ = _tiny_setup(stage=2)
    tcfg = TrainConfig(
        learning_rate=1e-3,
        warmup_ratio=0.0,
        lr_scheduler_type="constant",
        grad_checkpoint=True,
        output_dir=f"/tmp/aigv_mp_resume_{mode}_{pid}",
    )
    trainer = Trainer(model, params, tcfg, total_steps=4, mesh=mesh)
    step = trainer.compiled_step()
    mgr = CheckpointManager(ckpt_dir)

    # deterministic disjoint per-process shards for steps 0..2
    sampler = ShardedBatchSampler(
        12, 4, num_processes=2, process_index=pid, shuffle=False
    )
    step_indices = list(iter(sampler))[:3]

    def device_batch(local_indices):
        samples = [sample_for_index(i, cfg) for i in local_indices]
        local = {k: np.stack([s[k] for s in samples]) for k in samples[0]}
        return shard_batch(microbatch(local, 1), mesh, batch_dim=1)

    key = jax.random.key(0)
    with mesh:
        state = trainer.state
        if mode == "chain_save":
            losses = []
            for s in range(3):
                if s == 2:
                    # after 2 optimizer steps, before the third
                    mgr.save(2, state)
                state, loss = step(state, device_batch(step_indices[s]), key)
                losses.append(float(loss))
            mgr.close()
            print(
                f"MP_RESUME_OK pid={pid} mode={mode} "
                f"losses={losses[0]:.8f},{losses[1]:.8f},{losses[2]:.8f}"
            )
        else:
            state = mgr.restore(state, mesh=mesh)
            mgr.close()
            state, loss = step(state, device_batch(step_indices[2]), key)
            print(
                f"MP_RESUME_OK pid={pid} mode={mode} loss3={float(loss):.8f}"
            )


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]
    if len(sys.argv) > 3:
        run_resume(pid, port, sys.argv[3], sys.argv[4])
        return

    import jax

    from aigv_assessor_tpu.core.dist import init_dist

    init_dist(
        coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4

    from aigv_assessor_tpu.core.mesh import MeshConfig, make_mesh
    from aigv_assessor_tpu.data.sampler import ShardedBatchSampler
    from aigv_assessor_tpu.train.trainer import TrainConfig, Trainer, microbatch
    from __graft_entry__ import _tiny_setup

    mesh = make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))
    cfg, model, params, _ = _tiny_setup(stage=2)

    global_bs = 4
    sampler = ShardedBatchSampler(
        8, global_bs, num_processes=2, process_index=pid, shuffle=True, seed=0
    )
    local_indices = next(iter(sampler))
    assert len(local_indices) == global_bs // 2

    samples = [sample_for_index(i, cfg) for i in local_indices]
    local_batch = {
        k: np.stack([s[k] for s in samples]) for k in samples[0]
    }

    tcfg = TrainConfig(
        learning_rate=1e-3,
        warmup_ratio=0.0,
        lr_scheduler_type="constant",
        grad_checkpoint=True,
        output_dir=f"/tmp/aigv_mp_test_{pid}",
    )
    from aigv_assessor_tpu.parallel.sharding import shard_batch

    trainer = Trainer(model, params, tcfg, total_steps=2, mesh=mesh)
    step = trainer.compiled_step()
    with mesh:
        mb = microbatch(local_batch, 1)
        # per-host shard -> global arrays (make_array_from_process_local_data
        # fires because jax.process_count() == 2 here)
        device_batch = shard_batch(mb, mesh, batch_dim=1)
        state, loss = step(trainer.state, device_batch, jax.random.key(0))
        loss_val = float(loss)
    assert np.isfinite(loss_val), loss_val
    print(f"MP_OK pid={pid} procs={jax.process_count()} loss={loss_val:.6f}")


if __name__ == "__main__":
    main()

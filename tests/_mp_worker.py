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


def main():
    pid, port = int(sys.argv[1]), sys.argv[2]

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

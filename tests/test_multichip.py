"""Multi-chip dry-run as a test: full sharded train step on the 8-device
virtual mesh (mirrors the driver's dryrun_multichip contract)."""

import sys

import numpy as np
import pytest


@pytest.mark.slow
def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_entry_compiles():
    sys.path.insert(0, "/root/repo")
    import jax
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    loss = float(out[0])
    assert np.isfinite(loss)


def test_shard_batch_per_host_and_microbatch_dim():
    """Per-host sharded loading contract (SURVEY §2b): process-local shards
    assemble into the same global array as the replicated path, and the
    trainer's [accum, micro_bs, ...] layout shards dim 1 (never the scanned
    accum dim)."""
    import jax
    import numpy as np
    from jax.sharding import PartitionSpec

    from aigv_assessor_tpu.core.mesh import MeshConfig, make_mesh
    from aigv_assessor_tpu.parallel.sharding import shard_batch

    mesh = make_mesh(MeshConfig(data=2, fsdp=4, tensor=1))
    batch = {
        "input_ids": np.arange(2 * 16 * 12).reshape(2, 16, 12),
        "mos": np.arange(2 * 16.0).reshape(2, 16),
    }
    replicated = shard_batch(batch, mesh, batch_dim=1, process_local=False)
    local = shard_batch(batch, mesh, batch_dim=1, process_local=True)
    for k in batch:
        spec = replicated[k].sharding.spec
        assert spec[0] is None, spec  # accum dim never sharded
        assert spec[1] == ("data", "fsdp"), spec
        assert local[k].sharding.spec == spec
        np.testing.assert_array_equal(
            np.asarray(replicated[k]), np.asarray(local[k])
        )
        np.testing.assert_array_equal(np.asarray(local[k]), batch[k])

    # indivisible batch dims degrade to replication instead of erroring
    odd = shard_batch({"x": np.ones((2, 3, 4))}, mesh, batch_dim=1)
    assert odd["x"].sharding.spec == PartitionSpec(None, None, None) or all(
        a is None for a in odd["x"].sharding.spec
    )

"""Sharding-rule tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec

from aigv_assessor_tpu.core.mesh import MeshConfig, make_mesh
from aigv_assessor_tpu.parallel.sharding import (
    make_param_shardings,
    param_spec,
    shard_batch,
    shard_params,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(MeshConfig(data=2, fsdp=2, tensor=2))


class TestParamSpec:
    def test_wqkv_column_parallel(self, mesh):
        spec = param_spec(
            "params/language_model/layers_0/attention/wqkv/base/kernel",
            (64, 96),
            mesh,
        )
        assert spec == PartitionSpec("fsdp", "tensor")

    def test_wo_row_parallel(self, mesh):
        spec = param_spec(
            "params/language_model/layers_0/attention/wo/base/kernel",
            (64, 64),
            mesh,
        )
        assert spec == PartitionSpec("tensor", "fsdp")

    def test_indivisible_dim_dropped(self, mesh):
        # vocab 92553 is odd: fsdp axis must drop, not error
        spec = param_spec(
            "params/language_model/output/kernel", (64, 92553), mesh
        )
        assert spec == PartitionSpec("fsdp", None)

    def test_default_largest_dim(self, mesh):
        spec = param_spec("params/whatever/kernel", (6, 64), mesh)
        assert spec == PartitionSpec(None, "fsdp")

    def test_small_scalar_replicated(self, mesh):
        spec = param_spec("params/norm/weight", (7,), mesh)
        assert spec == PartitionSpec()


class TestShardedExecution:
    def test_sharded_matmul_runs(self, mesh):
        """A wqkv-shaped matmul with fsdp x tensor sharded weights must
        compile and produce the same result as unsharded."""
        rng = np.random.default_rng(0)
        x = rng.normal(size=(8, 16, 64)).astype(np.float32)
        w = rng.normal(size=(64, 96)).astype(np.float32)
        want = x @ w

        params = {"language_model": {"layers_0": {"attention": {"wqkv": {"base": {"kernel": w}}}}}}
        shardings = make_param_shardings(params, mesh)
        k_shard = shardings["language_model"]["layers_0"]["attention"]["wqkv"]["base"]["kernel"]
        assert k_shard.spec == PartitionSpec("fsdp", "tensor")

        with mesh:
            sharded = shard_params(params, mesh)
            wk = sharded["language_model"]["layers_0"]["attention"]["wqkv"]["base"]["kernel"]
            batch = shard_batch({"x": x}, mesh)

            @jax.jit
            def f(x, w):
                return x @ w

            got = f(batch["x"], wk)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    def test_batch_sharded_over_data_fsdp(self, mesh):
        x = np.zeros((8, 4), np.float32)
        with mesh:
            out = shard_batch({"x": x}, mesh)
        spec = out["x"].sharding.spec
        assert spec[0] == ("data", "fsdp")

    def test_odd_batch_replicated(self, mesh):
        x = np.zeros((3, 4), np.float32)
        with mesh:
            out = shard_batch({"x": x}, mesh)
        assert out["x"].sharding.spec == PartitionSpec(None, None)

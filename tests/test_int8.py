"""Int8 matmul kernel tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from aigv_assessor_tpu.ops.int8_matmul import int8_matmul, quantize_weight


class TestInt8Matmul:
    @pytest.mark.parametrize("m", [1, 7, 64])
    def test_matches_dequantized_reference(self, m):
        rng = np.random.default_rng(0)
        k, n = 256, 512
        x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
        w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
        q, scale = quantize_weight(w)
        want = np.asarray(x) @ (np.asarray(q, np.float32) * np.asarray(scale)[None, :])
        with pltpu.force_tpu_interpret_mode():
            got = int8_matmul(x, q, scale, out_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-2, atol=2e-2)

    def test_quantization_error_bounded(self):
        rng = np.random.default_rng(1)
        w = jnp.asarray(rng.normal(size=(128, 64)), jnp.float32)
        q, scale = quantize_weight(w)
        deq = np.asarray(q, np.float32) * np.asarray(scale)[None, :]
        err = np.abs(deq - np.asarray(w)).max()
        assert err <= float(jnp.abs(w).max()) / 127.0 + 1e-6

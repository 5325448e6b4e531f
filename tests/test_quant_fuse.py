"""Fused producer+quantize ops (`ops/quant_fuse.py`).

On CPU these exercise the XLA fallback; the Pallas kernels are verified
against the same fallback on-chip by `benchmarks/quant_fuse_probe.py`
(the fallback IS the spec — identical fp32 math). Here: the fused ops
must match the UNFUSED two-op chain (producer from ops/norms / jax.nn,
then `w8a8.quantize_rows`) bit-for-bit on the int8 output modulo 1 ulp of
rounding, and the scales must reconstruct the float activations.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aigv_assessor_tpu.ops import quant_fuse as qf
from aigv_assessor_tpu.ops.norms import layer_norm, rms_norm
from aigv_assessor_tpu.ops.w8a8 import quantize_rows


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(7)


def _dequant_close(q, s, y_ref, atol_scale=1.0):
    """Dequantized int8 must reconstruct the reference within one
    quantization step per element."""
    y = np.asarray(q, np.float32) * np.asarray(s)
    step = np.asarray(s) * atol_scale
    assert np.all(np.abs(y - np.asarray(y_ref, np.float32)) <= step + 1e-6)


def test_layernorm_quant_matches_two_op(rng):
    x = jnp.asarray(rng.normal(size=(4, 24, 256)) * 2.0, jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(256,)) * 0.2 + 1.0, jnp.float32)
    b = jnp.asarray(rng.normal(size=(256,)) * 0.1, jnp.float32)
    q, s = qf.layernorm_quant(x, g, b, eps=1e-6)
    assert q.dtype == jnp.int8 and s.shape == (4, 24, 1)
    y_ref = layer_norm(x.astype(jnp.float32), g, b, 1e-6)
    q2, s2 = quantize_rows(y_ref)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-4)
    assert np.abs(
        np.asarray(q, np.int32) - np.asarray(q2, np.int32)
    ).max() <= 1
    _dequant_close(q, s, y_ref)


def test_gelu_quant_matches_two_op(rng):
    x = jnp.asarray(rng.normal(size=(6, 512)) * 3.0, jnp.bfloat16)
    q, s = qf.gelu_quant(x)
    y_ref = jax.nn.gelu(x.astype(jnp.float32), approximate=True)
    q2, s2 = quantize_rows(y_ref)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-4)
    assert np.abs(
        np.asarray(q, np.int32) - np.asarray(q2, np.int32)
    ).max() <= 1
    _dequant_close(q, s, y_ref)


def test_rmsnorm_quant_matches_two_op(rng):
    x = jnp.asarray(rng.normal(size=(2, 16, 384)), jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(384,)) * 0.2 + 1.0, jnp.float32)
    q, s = qf.rmsnorm_quant(x, g, eps=1e-5)
    y_ref = rms_norm(x.astype(jnp.float32), g, 1e-5)
    q2, s2 = quantize_rows(y_ref)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-4)
    assert np.abs(
        np.asarray(q, np.int32) - np.asarray(q2, np.int32)
    ).max() <= 1
    _dequant_close(q, s, y_ref)


def test_silu_mul_quant_matches_two_op(rng):
    h1 = jnp.asarray(rng.normal(size=(10, 256)) * 2.0, jnp.bfloat16)
    h3 = jnp.asarray(rng.normal(size=(10, 256)), jnp.bfloat16)
    q, s = qf.silu_mul_quant(h1, h3)
    y_ref = jax.nn.silu(h1.astype(jnp.float32)) * h3.astype(jnp.float32)
    q2, s2 = quantize_rows(y_ref)
    np.testing.assert_allclose(np.asarray(s), np.asarray(s2), rtol=1e-4)
    assert np.abs(
        np.asarray(q, np.int32) - np.asarray(q2, np.int32)
    ).max() <= 1
    _dequant_close(q, s, y_ref)


def test_quantized_feed_into_w8a8_matmul(rng):
    """The (q, s) tuple must drop into `w8a8_matmul`'s pre-quantized input
    form and produce the same result as quantize-inside."""
    from aigv_assessor_tpu.ops.w8a8 import w8a8_matmul

    x = jnp.asarray(rng.normal(size=(4, 8, 128)), jnp.bfloat16)
    g = jnp.asarray(np.ones(128), jnp.float32)
    b = jnp.asarray(np.zeros(128), jnp.float32)
    wq = jnp.asarray(rng.integers(-127, 128, (128, 64)), jnp.int8)
    sw = jnp.asarray((rng.random(64) + 0.5) * 2e-2, jnp.float32)

    y_norm = layer_norm(x, g, b, 1e-6).astype(jnp.bfloat16)
    ref = w8a8_matmul(y_norm, wq, sw)
    qs = qf.layernorm_quant(x, g, b, eps=1e-6)
    fused = w8a8_matmul(qs, wq, sw)
    # both paths quantize the SAME normalized activations; the only
    # differences are bf16 rounding of the unfused norm output and <=1
    # int8 step per input element. Bound the output difference by the
    # exact error propagation: 1.5 steps * sum_j |w_qj| * s_w
    sx = np.asarray(qs[1], np.float32)  # [B, S, 1]
    col = np.abs(np.asarray(wq, np.float32)).sum(0) * np.asarray(sw)  # [N]
    bound = 1.5 * sx * col  # broadcasts to [B, S, N] via [B,S,1]*[N]
    diff = np.abs(
        np.asarray(fused, np.float32) - np.asarray(ref, np.float32)
    )
    assert np.all(diff <= bound + 1e-5), (diff / np.maximum(bound, 1e-9)).max()

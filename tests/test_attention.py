"""Attention tests: XLA reference path vs numpy, GQA, causal, decode mask, and
the Pallas kernel in interpreter mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aigv_assessor_tpu.ops.attention import xla_attention


def naive_attention(q, k, v, causal=False, mask=None):
    """Dense numpy attention with repeated kv heads (reference repeat_kv,
    modeling_internlm2.py:282-292)."""
    b, sq, hq, d = q.shape
    _, skv, hkv, _ = k.shape
    g = hq // hkv
    k = np.repeat(k, g, axis=2)
    v = np.repeat(v, g, axis=2)
    out = np.zeros_like(q)
    scale = d**-0.5
    for bi in range(b):
        for h in range(hq):
            s = q[bi, :, h] @ k[bi, :, h].T * scale
            if causal:
                for i in range(sq):
                    for j in range(skv):
                        if j > i + (skv - sq):
                            s[i, j] = -np.inf
            if mask is not None:
                s = np.where(mask[bi], s, -np.inf)
            p = np.exp(s - s.max(-1, keepdims=True))
            p = p / p.sum(-1, keepdims=True)
            out[bi, :, h] = p @ v[bi, :, h]
    return out


def rand_qkv(rng, b, sq, skv, hq, hkv, d):
    q = rng.normal(size=(b, sq, hq, d)).astype(np.float32)
    k = rng.normal(size=(b, skv, hkv, d)).astype(np.float32)
    v = rng.normal(size=(b, skv, hkv, d)).astype(np.float32)
    return q, k, v


class TestXLAAttention:
    @pytest.mark.parametrize("causal", [False, True])
    def test_mha(self, causal):
        rng = np.random.default_rng(0)
        q, k, v = rand_qkv(rng, 2, 6, 6, 4, 4, 8)
        got = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal)
        want = naive_attention(q, k, v, causal=causal)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_gqa(self):
        rng = np.random.default_rng(1)
        q, k, v = rand_qkv(rng, 1, 5, 5, 8, 2, 4)
        got = xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=True)
        want = naive_attention(q, k, v, causal=True)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)

    def test_bool_mask_decode(self):
        """Single query over a longer kv (decode step with cache)."""
        rng = np.random.default_rng(2)
        q, k, v = rand_qkv(rng, 1, 1, 8, 2, 2, 4)
        valid = np.zeros((1, 1, 8), bool)
        valid[:, :, :5] = True  # only first 5 cache slots valid
        got = xla_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask=jnp.asarray(valid)
        )
        want = naive_attention(q, k, v, mask=valid)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)


class TestPallasFlashAttention:
    """Kernel correctness in interpreter mode (no TPU needed)."""

    def _run(self, causal, b=1, s=256, hq=2, hkv=1, d=64, dtype=np.float32):
        from jax.experimental.pallas import tpu as pltpu
        from aigv_assessor_tpu.ops.pallas_attention import flash_attention

        rng = np.random.default_rng(42)
        q, k, v = rand_qkv(rng, b, s, s, hq, hkv, d)
        q, k, v = (x.astype(dtype) for x in (q, k, v))
        with pltpu.force_tpu_interpret_mode():
            got = flash_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), causal=causal
            )
        want = naive_attention(
            q.astype(np.float32), k.astype(np.float32), v.astype(np.float32),
            causal=causal,
        )
        np.testing.assert_allclose(np.asarray(got, np.float32), want, rtol=2e-2, atol=2e-2)

    def test_noncausal(self):
        self._run(False)

    def test_causal(self):
        self._run(True)

    def test_gqa_causal(self):
        self._run(True, hq=4, hkv=2)

    def test_unaligned_seq_masking(self):
        """Sq=Skv=130 (not a block multiple): padded keys must not leak."""
        self._run(False, s=130)

    def test_grad_matches_xla(self):
        from jax.experimental.pallas import tpu as pltpu
        from aigv_assessor_tpu.ops.pallas_attention import flash_attention

        rng = np.random.default_rng(7)
        q, k, v = rand_qkv(rng, 1, 128, 128, 2, 1, 64)
        args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))

        def loss_pallas(q, k, v):
            return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

        def loss_xla(q, k, v):
            return jnp.sum(xla_attention(q, k, v, causal=True) ** 2)

        with pltpu.force_tpu_interpret_mode():
            gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(*args)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(*args)
        for a, b in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=5e-2, atol=5e-2
            )

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


class TestFusedQKVFlash:
    """flash_attention_qkv: q/k/v as BlockSpec views of one fused
    head-major array (interpret mode verifies the index-map arithmetic)."""

    def _run(self, causal, b=2, s=200, hq=4, hkv=2, d=64, kv_valid=None):
        from jax.experimental.pallas import tpu as pltpu
        from aigv_assessor_tpu.ops.pallas_attention import flash_attention_qkv

        rng = np.random.default_rng(7)
        sv = kv_valid if kv_valid is not None else s
        q = rng.normal(size=(b, hq, s, d)).astype(np.float32)
        k = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
        v = rng.normal(size=(b, hkv, s, d)).astype(np.float32)
        if kv_valid is not None:  # garbage beyond kv_valid must be masked
            k[:, :, kv_valid:] = 1e3
            v[:, :, kv_valid:] = -1e3
        qkv = jnp.asarray(np.concatenate([q, k, v], axis=1))
        with pltpu.force_tpu_interpret_mode():
            got = flash_attention_qkv(
                qkv, hq, hkv, causal=causal, kv_valid=kv_valid
            )
        # reference on the valid prefix, bshd layout
        want = naive_attention(
            q.transpose(0, 2, 1, 3)[:, :sv],
            k.transpose(0, 2, 1, 3)[:, :sv],
            v.transpose(0, 2, 1, 3)[:, :sv],
            causal=causal,
        ).transpose(0, 2, 1, 3)
        np.testing.assert_allclose(
            np.asarray(got, np.float32)[:, :, :sv], want, rtol=2e-2, atol=2e-2
        )

    def test_mha_noncausal(self):
        self._run(False, hq=4, hkv=4)  # hp=2 pairing path

    def test_gqa_causal(self):
        self._run(True, hq=4, hkv=2, d=128)

    def test_kv_valid_masks_tail(self):
        self._run(False, hq=4, hkv=4, s=200, kv_valid=150)

    def test_grad_matches_sliced(self):
        """Fused-qkv VJP == slicing + per-tensor flash VJP."""
        from jax.experimental.pallas import tpu as pltpu
        from aigv_assessor_tpu.ops.pallas_attention import (
            flash_attention,
            flash_attention_qkv,
        )

        rng = np.random.default_rng(9)
        b, hq, hkv, s, d = 1, 2, 1, 64, 64
        qkv = jnp.asarray(
            rng.normal(size=(b, hq + 2 * hkv, s, d)).astype(np.float32)
        )

        def loss_fused(qkv):
            return jnp.sum(flash_attention_qkv(qkv, hq, hkv, causal=True) ** 2)

        def loss_sliced(qkv):
            out = flash_attention(
                qkv[:, :hq], qkv[:, hq : hq + hkv], qkv[:, hq + hkv :],
                causal=True, layout="bhsd",
            )
            return jnp.sum(out**2)

        with pltpu.force_tpu_interpret_mode():
            g1 = jax.grad(loss_fused)(qkv)
            g2 = jax.grad(loss_sliced)(qkv)
        np.testing.assert_allclose(
            np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-3
        )

    def test_grad_with_garbage_tail(self):
        """kv_valid grad correctness: gradients at valid positions match a
        reference on the valid prefix; garbage-tail positions get ZERO grads
        (the fwd masks them, so nothing may flow back through them)."""
        from jax.experimental.pallas import tpu as pltpu
        from aigv_assessor_tpu.ops.pallas_attention import flash_attention_qkv

        rng = np.random.default_rng(11)
        b, hq, hkv, s, d, sv = 1, 2, 2, 64, 64, 40
        qkv_np = rng.normal(size=(b, hq + 2 * hkv, s, d)).astype(np.float32)
        qkv_np[:, hq:, sv:] = 100.0  # garbage k/v tail
        qkv = jnp.asarray(qkv_np)

        def loss(qkv):
            out = flash_attention_qkv(qkv, hq, hkv, causal=False, kv_valid=sv)
            return jnp.sum(out[:, :, :sv] ** 2)

        def loss_ref(qkv):
            q = qkv[:, :hq, :sv].transpose(0, 2, 1, 3)
            k = qkv[:, hq : hq + hkv, :sv].transpose(0, 2, 1, 3)
            v = qkv[:, hq + hkv :, :sv].transpose(0, 2, 1, 3)
            from aigv_assessor_tpu.ops.attention import xla_attention

            return jnp.sum(xla_attention(q, k, v) ** 2)

        with pltpu.force_tpu_interpret_mode():
            g = jax.grad(loss)(qkv)
        g_ref = jax.grad(loss_ref)(qkv)
        g, g_ref = np.asarray(g), np.asarray(g_ref)
        np.testing.assert_allclose(
            g[:, :, :sv], g_ref[:, :, :sv], rtol=2e-3, atol=2e-3
        )
        # k/v tail gradients must be exactly zero (q tail rows get grads
        # only through their own masked-out outputs, which the loss excludes)
        np.testing.assert_array_equal(g[:, hq:, sv:], 0.0)

"""Pallas decode-attention kernel vs the XLA two-part reference (interpret
mode on CPU; the compiled path runs on TPU via benchmarks/decode_bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aigv_assessor_tpu.ops.attention import two_part_cached_attention
from aigv_assessor_tpu.ops.decode_attention import (
    cached_decode_attention,
    decode_attention,
    merge_new_token,
)


def _mk(b=2, hq=8, hkv=4, d=128, max_len=64, idx=37, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, 1, hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, 1, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, 1, hkv, d)), jnp.float32)
    ck = jnp.asarray(rng.normal(size=(b, max_len, hkv, d)), jnp.float32)
    cv = jnp.asarray(rng.normal(size=(b, max_len, hkv, d)), jnp.float32)
    return q, k, v, ck, cv, jnp.asarray(idx, jnp.int32)


@pytest.mark.slow
class TestDecodeAttentionKernel:
    def test_matches_two_part_full_window(self):
        q, k, v, ck, cv, idx = _mk()
        ref = two_part_cached_attention(q, k, v, ck, cv, idx, None)
        got = cached_decode_attention(
            q, k, v, ck, cv, idx, None, blk=16, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_matches_two_part_left_padded_ragged(self):
        """Per-sample windows: left-padded prompts of different lengths."""
        b, max_len, idx = 3, 64, 48
        q, k, v, ck, cv, idxj = _mk(b=b, max_len=max_len, idx=idx, seed=1)
        kv_mask = np.zeros((b, max_len), bool)
        for i, start in enumerate([0, 17, 40]):  # ragged valid suffixes
            kv_mask[i, start:idx] = True
            kv_mask[i, idx:] = True  # future slots marked writable-valid
        kv_mask = jnp.asarray(kv_mask)
        ref = two_part_cached_attention(q, k, v, ck, cv, idxj, kv_mask)
        got = cached_decode_attention(
            q, k, v, ck, cv, idxj, kv_mask, blk=16, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_unaligned_index_and_blocks(self):
        """cache_index not a multiple of the block size; max_len not a
        multiple either."""
        q, k, v, ck, cv, _ = _mk(max_len=56, idx=0, seed=2)
        for idx in [1, 15, 16, 17, 55]:
            idxj = jnp.asarray(idx, jnp.int32)
            ref = two_part_cached_attention(q, k, v, ck, cv, idxj, None)
            got = cached_decode_attention(
                q, k, v, ck, cv, idxj, None, blk=16, interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5,
                err_msg=f"idx={idx}",
            )

    def test_gqa_groups(self):
        q, k, v, ck, cv, idx = _mk(hq=8, hkv=2, d=64, seed=3)
        ref = two_part_cached_attention(q, k, v, ck, cv, idx, None)
        got = cached_decode_attention(
            q, k, v, ck, cv, idx, None, blk=32, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5
        )

    def test_kernel_state_is_valid_softmax(self):
        """m/l returned by the kernel must reproduce the plain softmax over
        the window when merged with a -inf new token (i.e. old-only)."""
        q, k, v, ck, cv, idx = _mk(seed=4)
        out, m, l = decode_attention(
            q[:, 0], ck, cv,
            jnp.zeros((q.shape[0],), jnp.int32), idx,
            blk=16, interpret=True,
        )
        # reference: plain softmax over rows [0, idx)
        qf = np.asarray(q[:, 0], np.float64)  # [B, Hq, D]
        b, hq, d = qf.shape
        hkv = ck.shape[2]
        g = hq // hkv
        ckf = np.asarray(ck, np.float64)[:, : int(idx)]
        cvf = np.asarray(cv, np.float64)[:, : int(idx)]
        for bi in range(b):
            for h in range(hq):
                s = ckf[bi, :, h // g, :] @ qf[bi, h] / np.sqrt(d)
                p = np.exp(s - s.max())
                ref = (p / p.sum()) @ cvf[bi, :, h // g, :]
                np.testing.assert_allclose(
                    np.asarray(out)[bi, h], ref, rtol=2e-5, atol=2e-5
                )


@pytest.mark.slow
def test_merge_new_token_equals_joint_softmax():
    q, k, v, ck, cv, idx = _mk(seed=5)
    out, m, l = decode_attention(
        q[:, 0], ck, cv, jnp.zeros((q.shape[0],), jnp.int32), idx,
        blk=16, interpret=True,
    )
    got = merge_new_token(out, m, l, q[:, 0], k, v)
    ref = two_part_cached_attention(q, k, v, ck, cv, idx, None)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref[:, 0]), rtol=2e-5, atol=2e-5
    )

"""Pallas decode-attention kernel: one query token vs the read-only KV cache.

TPU-native counterpart of the reference's FA2 varlen decode path
(`/root/reference/internvl/model/internlm2/modeling_internlm2.py:444-614`,
which unpads ragged batches with cu_seqlens). Decode at batch>1 is
HBM-bandwidth-bound on the cache read; the XLA einsum formulation
(`ops/attention.py:two_part_cached_attention`) reads the FULL padded
[B, max_len] cache for every sample. This kernel reads, per sample, only
the blocks inside its valid window [start_b, end):

- `starts`/`end` are scalar-prefetched (PrefetchScalarGridSpec), so the
  k/v BlockSpec index maps clamp out-of-window block indices to the window
  edge — consecutive identical indices are not re-fetched by the Pallas
  pipeline, so skipped blocks cost no HBM traffic — and `@pl.when` skips
  their compute. With left-padded ragged prompts (generation.py batch
  path) a sample with a short prompt reads only its suffix of the cache.
- GQA is handled in-kernel: per kv head, q [G, D] contracts against the
  shared K block (no repeated-KV materialization), same as the training
  flash kernel (`ops/pallas_attention.py`).
- Online softmax runs over kv blocks in fp32 scratch; the kernel returns
  (out, m, l) so the caller can merge the CURRENT token's k/v analytically
  (`merge_new_token`) — the cache itself is never copied or updated here,
  preserving the carry-aliased no-copy decode design (BENCH_NOTES.md).

Layouts: q [B, Hq, D]; cache k/v [B, max_len, Hkv, D] (the model's native
cache layout — no relayout on the decode path); D in {64, 128}; BLK rows
of cache per grid step.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def decode_kernel_supported(hq: int, hkv: int, d: int, batch: int = 1) -> bool:
    """Compiled-path eligibility: TPU backend, MXU-friendly head dim, GQA
    grouping, enough query heads for a sublane tile.

    Default OFF: measured at 2B (BENCH_NOTES.md round 3), this kernel LOSES
    to the XLA einsum decode path at every batch size tried — 129.7 vs 185
    tok/s at bs=1 and 300 vs 1051 aggregate tok/s at bs=8 (full 2097-token
    windows). The per-(sample, kv-head) [G, D] @ [D, BLK] dots are too
    narrow for the MXU, and XLA batches the whole cache read as one einsum
    at near-HBM-peak. Its ragged-window HBM saving can only win when
    samples' valid lengths are far shorter than max_len; force it on for
    such workloads with AIGV_DECODE_KERNEL=1 (0 forces off)."""
    import os

    from aigv_assessor_tpu.ops.attention import _on_tpu

    force = os.environ.get("AIGV_DECODE_KERNEL")
    ok = _on_tpu() and d in (64, 128) and hq % hkv == 0 and hq >= 8
    return ok and force == "1"


def _decode_kernel(
    # scalar prefetch
    starts_ref,  # [B] int32: first valid cache row per sample
    end_ref,  # [1] int32: rows [*, end) are written (shared cache_index)
    # inputs
    q_ref,  # [1, Hq, D]
    k_ref,  # [1, BLK, Hkv, D]
    v_ref,  # [1, BLK, Hkv, D]
    # outputs
    out_ref,  # [1, Hq, D]
    m_ref,  # [1, Hq, 128] fp32 (running max, broadcast over lanes)
    l_ref,  # [1, Hq, 128] fp32 (running denom)
    # scratch
    acc_ref,  # [Hq, D] fp32
    ms_ref,  # [Hq, 128] fp32
    ls_ref,  # [Hq, 128] fp32
    *,
    blk: int,
    hkv: int,
    scale: float,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    nb = pl.num_programs(1)

    start = starts_ref[b]
    end = end_ref[0]
    start_blk = start // blk
    # last block that contains any valid row (end == 0 => none; compute is
    # skipped by `live` below, clamp keeps indices legal)
    end_blk = jnp.maximum(end - 1, 0) // blk

    @pl.when(j == 0)
    def _init():
        ms_ref[:] = jnp.full_like(ms_ref, NEG_INF)
        ls_ref[:] = jnp.zeros_like(ls_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    live = (j >= start_blk) & (j <= end_blk) & (end > 0)

    @pl.when(live)
    def _block():
        q = q_ref[0]  # [Hq, D]
        hq, d = q.shape
        g = hq // hkv
        row0 = j * blk
        rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (1, blk), 1)
        valid = (rows >= start) & (rows < end)  # [1, BLK]
        # same mask in [BLK, 1] orientation, built directly (Mosaic can't
        # reshape i1 vectors across the minor dim)
        rows_col = row0 + jax.lax.broadcasted_iota(jnp.int32, (blk, 1), 0)
        vrow = (rows_col >= start) & (rows_col < end)  # [BLK, 1]

        # scores [Hq, BLK]: per kv head, q_h [G, D] @ k_h^T [D, BLK]
        parts = []
        for h in range(hkv):
            kh = k_ref[0, :, h, :]  # [BLK, D]
            qh = q[h * g : (h + 1) * g, :]  # [G, D]
            parts.append(
                jax.lax.dot_general(
                    qh,
                    kh,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # [G, BLK]
        s = jnp.concatenate(parts, axis=0) * scale  # [Hq, BLK]
        s = jnp.where(valid, s, NEG_INF)

        m_prev = ms_ref[:, :1]  # [Hq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [Hq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)  # [Hq, 1]
        p = jnp.exp(s - m_new)  # [Hq, BLK]
        p = jnp.where(valid, p, 0.0)

        ls_ref[:] = jnp.broadcast_to(
            ls_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True),
            ls_ref.shape,
        )
        ms_ref[:] = jnp.broadcast_to(m_new, ms_ref.shape)

        pb = p.astype(v_ref.dtype)
        # zero garbage V rows (tail of a partial out-of-bounds block) with a
        # select: the matching p columns are 0, but 0 * NaN = NaN would
        # still poison the dot (a multiply mask has the same problem)
        ctx_parts = []
        for h in range(hkv):
            vh = jnp.where(vrow, v_ref[0, :, h, :], 0)  # [BLK, D]
            ph = pb[h * g : (h + 1) * g, :]  # [G, BLK]
            ctx_parts.append(
                jax.lax.dot_general(
                    ph,
                    vh,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # [G, D]
        ctx = jnp.concatenate(ctx_parts, axis=0)  # [Hq, D]
        acc_ref[:] = acc_ref[:] * alpha + ctx

    @pl.when(j == nb - 1)
    def _finish():
        l = ls_ref[:, :1]
        # guard fully-masked rows (empty cache): emit zeros, l=0
        out = acc_ref[:] / jnp.where(l > 0, l, 1.0)
        out_ref[0] = out.astype(out_ref.dtype)
        m_ref[0] = ms_ref[:]
        l_ref[0] = ls_ref[:]


# NOT jit-wrapped: always called inside the model's jit (a nested jit is a
# fusion boundary — see ops/attention.py note)
def decode_attention(
    q: jnp.ndarray,  # [B, Hq, D]
    cache_k: jnp.ndarray,  # [B, max_len, Hkv, D]
    cache_v: jnp.ndarray,
    starts: jnp.ndarray,  # [B] int32 first valid row per sample
    end: jnp.ndarray,  # scalar int32: rows [start_b, end) are attended
    blk: int = 256,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single-token attention over the cache; returns (out [B,Hq,D] in q's
    dtype, m [B,Hq] fp32, l [B,Hq] fp32) for `merge_new_token`."""
    b, hq, d = q.shape
    _, max_len, hkv, _ = cache_k.shape
    assert hq % hkv == 0
    blk = min(blk, max_len)
    nb = pl.cdiv(max_len, blk)
    scale = d**-0.5

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec(
                (1, hq, d), lambda bi, j, st, en: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, blk, hkv, d),
                lambda bi, j, st, en: (
                    bi,
                    jnp.clip(
                        j, st[bi] // blk, jnp.maximum(en[0] - 1, 0) // blk
                    ),
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, blk, hkv, d),
                lambda bi, j, st, en: (
                    bi,
                    jnp.clip(
                        j, st[bi] // blk, jnp.maximum(en[0] - 1, 0) // blk
                    ),
                    0,
                    0,
                ),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, hq, d), lambda bi, j, st, en: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hq, 128), lambda bi, j, st, en: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, hq, 128), lambda bi, j, st, en: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        scratch_shapes=[
            pltpu.VMEM((hq, d), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
            pltpu.VMEM((hq, 128), jnp.float32),
        ],
    )

    out, m, l = pl.pallas_call(
        functools.partial(_decode_kernel, blk=blk, hkv=hkv, scale=scale),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, hq, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, hq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(starts.astype(jnp.int32), end.reshape(1).astype(jnp.int32), q, cache_k, cache_v)
    return out, m[:, :, 0], l[:, :, 0]


def merge_new_token(
    out_old: jnp.ndarray,  # [B, Hq, D] (kernel output, normalized)
    m_old: jnp.ndarray,  # [B, Hq]
    l_old: jnp.ndarray,  # [B, Hq]
    q: jnp.ndarray,  # [B, Hq, D]
    k_new: jnp.ndarray,  # [B, 1, Hkv, D] current token's key
    v_new: jnp.ndarray,  # [B, 1, Hkv, D]
) -> jnp.ndarray:
    """Fold the current token's self-attention term into the kernel's online
    softmax state: softmax spans (old cache rows) + (this token), exactly as
    in `two_part_cached_attention`, without the cache ever being updated
    before attention."""
    b, hq, d = q.shape
    hkv = k_new.shape[2]
    g = hq // hkv
    scale = d**-0.5
    qg = q.reshape(b, hkv, g, d)
    kn = k_new[:, 0]  # [B, Hkv, D]
    vn = v_new[:, 0]
    s_new = (
        jnp.einsum("bhgd,bhd->bhg", qg.astype(jnp.float32), kn.astype(jnp.float32))
        * scale
    ).reshape(b, hq)
    m_new = jnp.maximum(m_old, s_new)
    alpha = jnp.exp(m_old - m_new)  # [B, Hq]
    p_new = jnp.exp(s_new - m_new)
    denom = l_old * alpha + p_new
    w_old = (l_old * alpha / denom)[..., None]  # [B, Hq, 1]
    w_new = (p_new / denom)[..., None]
    vn_g = jnp.repeat(vn, g, axis=1).astype(jnp.float32)  # [B, Hq, D]
    out = out_old.astype(jnp.float32) * w_old + vn_g * w_new
    return out.astype(q.dtype)


def cached_decode_attention(
    q: jnp.ndarray,  # [B, 1, Hq, D]
    k: jnp.ndarray,  # [B, 1, Hkv, D] current token (rope applied)
    v: jnp.ndarray,
    cache_k: jnp.ndarray,  # [B, max_len, Hkv, D] read-only
    cache_v: jnp.ndarray,
    cache_index: jnp.ndarray,  # scalar int32
    kv_mask: Optional[jnp.ndarray] = None,  # [B, max_len] bool (left-pad)
    blk: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Drop-in single-token replacement for `two_part_cached_attention`:
    Pallas kernel over the valid cache window + analytic merge of the
    current token. Valid rows per sample are [starts_b, cache_index) with
    `starts` derived from the left-padding mask (prefix pads False)."""
    b = q.shape[0]
    if kv_mask is not None:
        starts = jnp.argmax(kv_mask.astype(jnp.int32), axis=1).astype(jnp.int32)
        # all-False mask row => argmax 0; harmless (end=0 case guarded)
    else:
        starts = jnp.zeros((b,), jnp.int32)
    out_old, m_old, l_old = decode_attention(
        q[:, 0], cache_k, cache_v, starts, cache_index, blk=blk,
        interpret=interpret,
    )
    out = merge_new_token(out_old, m_old, l_old, q[:, 0], k, v)
    return out[:, None]  # [B, 1, Hq, D]

"""Pallas TPU flash-attention (forward + backward).

TPU-native replacement for the reference's CUDA flash-attn kernels
(`/root/reference/internvl/model/internvl_chat/flash_attention.py` for the
non-causal ViT path, `modeling_internlm2.py:444-614` for the causal GQA
decoder path). Standard online-softmax tiling:

- arrays are laid out [B*H, S, D] (heads folded into the leading grid dim) so
  every BlockSpec's trailing two dims are (seq_tile, D) — seq_tile a multiple
  of 8 and D equal to the full array dim, satisfying Mosaic's tiling rules.
  The [B,S,H,D] <-> [B*H,S,D] relayout costs ~1.6 ms ISOLATED between two
  pallas calls on the ViT shape, but in model context XLA fuses the
  transposes into the adjacent qkv/out projection matmuls (measured: proj +
  transposes run at the same TFLOP/s as proj alone — BENCH_NOTES.md).
  Native-layout kernels were tried and LOSE: lane-sliced per-head loads from
  a [B,S,H*D] block run at 38 TFLOP/s vs 57 for this layout, and dynamic
  head indexing on the sublane dim does not lower ("index in dimension 2
  must be a multiple of 8");
- grid (B*Hq, num_q_blocks); each program owns one q tile in VMEM and streams
  K/V tiles of its kv head. GQA maps q row bh -> kv row
  (bh // Hq) * Hkv + (bh % Hq) // G inside the BlockSpec index map, so
  repeated K/V heads are never materialized in HBM;
- softmax runs in base-2: scale*log2(e) is folded into the (small) q tile, so
  the [BQ, BK] score tile takes no scaling pass and `exp2` (the VPU's native
  transcendental) replaces `exp`. The saved logsumexp is converted back to
  natural-log units for the backward kernels;
- running (row-max m, row-sum l, accumulator acc) carried through
  `lax.fori_loop`; softmax math in fp32 on the VPU, the two matmuls per tile
  (q·kT, p·v) on the MXU with fp32 accumulation. KV blocks strictly below the
  causal diagonal and inside the true length run a mask-free body (no iota /
  compare / select passes); only the diagonal and tail blocks pay for masking;
- tail keys beyond the true (pre-padding) length are masked against a static
  `kv_valid` bound — replacing cu_seqlens/varlen packing (the pipeline pads
  to static lengths anyway, `dataset.py:637`);
- the inference path compiles a kernel WITHOUT the logsumexp output (it is
  only needed for the backward pass); the custom-VJP fwd rule uses the
  lse-producing variant. lse is stored lane-major as [B*H, S];
- backward is the standard two-kernel scheme (dq; dk/dv) from the saved
  logsumexp and delta = rowsum(dout * out); dk/dv are produced per *query*
  head and group-summed outside (G = 4 for InternLM2's 32q/8kv).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
# causal kernels prefer smaller q tiles: the diagonal band is tighter, so
# less of each q block's kv loop runs masked (swept on the LLM shape
# S=2113 16q/8kv D=128 bs=4: 256/512 = 1.27 ms vs 512/512 = 1.56 ms)
CAUSAL_BLOCK_Q = 256
# sequences up to this length use a single full-width kv (and q) tile: fewer
# grid steps and larger matmuls dominate the online-softmax bookkeeping
# (measured on v5e: 13.9 -> 29.1 TFLOP/s on the ViT's 1025-token shape)
_FULL_TILE_MAX = 2048
# inference-path probability tiles in bf16 (see _fwd_kernel single-tile
# path); module-level so benchmarks can sweep it. AD always keeps fp32.
PF16_INFERENCE = False
_NEG_INF = -1e30
_LOG2E = 1.4426950408889634
_LN2 = 0.6931471805599453


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_dim(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
    size = x.shape[axis]
    target = _cdiv(size, multiple) * multiple
    if target == size:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - size)
    return jnp.pad(x, pad)


def supported(q, k, v, mask) -> bool:
    """Shapes this kernel handles; everything else falls back to XLA."""
    if mask is not None:
        return False
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        return False
    b, sq, hq, d = q.shape
    _, skv, hkv, dk = k.shape
    if d != dk or hq % hkv != 0:
        return False
    if d % 128 != 0 and d not in (64,):
        return False
    if sq < 8 or skv < 8:
        return False
    return True


# ---------------------------------------------------------------- forward ---


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, *rest,
    scale, causal, kv_valid, block_k, hp, with_lse, mask_tail=False,
    pf16=False, dense_out=False,
):
    """hp = heads per program (leading block dim): interleaving 2 heads lets
    the scheduler overlap one head's VPU softmax with the other's MXU matmuls
    (measured 6.6 -> 5.8 ms on the ViT shape; >2 crashes the backend).

    dense_out: the output block is [1, BQ, hp*D] of a dense [B, S, Hq*D]
    array — the out-projection's natural input form, so wo/proj can run as a
    single [B*S, Hq*D] x [Hq*D, C] int8 MXU matmul with no relayout (the
    head-major-IN int8 einsum measured 39.8 TOPS vs ~264 dense; round-4
    BENCH_NOTES). Inference-only (no lse)."""
    assert not (dense_out and with_lse)
    lse_ref = rest[0] if with_lse else None
    qi = pl.program_id(1)
    num_k_blocks = _cdiv(kv_valid, block_k)
    c = scale * _LOG2E  # base-2 softmax: scale folded into q (see module doc)

    dense_vals = []
    for hh in range(hp):
        q = q_ref[hh] * c  # [BQ, D]
        block_q, d = q.shape

        if not causal and num_k_blocks == 1:
            # single-tile fast path. A caller-pre-padded tail (explicit
            # kv_valid, garbage evolved pad tokens) is folded into the same
            # regime as kernel-internal zero padding by zeroing the k/v tail
            # ROWS first: that's a where-pass over two [BK, D] bf16 tiles
            # (~132 KB each on the ViT shape) instead of masking the fp32
            # [BQ, BK] score tile (~4.3 MB read+write). Zeroed columns then
            # score exactly 0 and contribute n_pad * exp2(-m) of softmax
            # mass, subtracted in closed form; their pv contribution is 0
            # because the v rows are zero too.
            # the BlockSpec delivers the FULL padded sequence as one tile,
            # which equals block_k only when auto-tiling chose a full-seq
            # block — derive the pad count from the tile itself so an
            # explicit kv_valid <= block_k with a longer padded sequence
            # (num_k_blocks == 1 but a wider tile) is still masked
            k_t = k_ref[hh]
            v_t = v_ref[hh]
            n_pad = k_t.shape[0] - kv_valid
            if mask_tail and n_pad:
                rid = lax.broadcasted_iota(jnp.int32, (k_t.shape[0], 1), 0)
                row_ok = rid < kv_valid  # [BK, 1]
                k_t = jnp.where(row_ok, k_t, 0)
                v_t = jnp.where(row_ok, v_t, 0)
            s = lax.dot_general(
                q, k_t, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(s, axis=1, keepdims=True)
            if pf16 and not with_lse:
                # inference-only: store the probability tile in the v dtype
                # (bf16) straight out of the exp2 pass — halves pf VMEM
                # traffic; row-sum still accumulates fp32. ~1e-3 relative,
                # inside bf16 output rounding. AD keeps fp32 (exact lse).
                pf = jnp.exp2(s - m).astype(v_t.dtype)
                l = jnp.sum(pf.astype(jnp.float32), axis=1, keepdims=True)
            else:
                pf = jnp.exp2(s - m)
                l = jnp.sum(pf, axis=1, keepdims=True)
            pv = lax.dot_general(
                pf.astype(v_t.dtype), v_t, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if n_pad:
                # zero-scoring pad columns (kernel pad or zeroed tail)
                l = l - n_pad * jnp.exp2(-m)
            r = 1.0 / jnp.where(l <= 0.0, 1.0, l)
            o_val = (pv * r).astype(o_ref.dtype)
            if dense_out:
                dense_vals.append(o_val)
            else:
                o_ref[hh] = o_val
            if with_lse:
                lse = jnp.where(l <= 0.0, _NEG_INF, m * _LN2 - jnp.log(r))
                lse_ref[0, hh] = lse[:, 0]
            continue

        if causal:
            last_needed = lax.div((qi + 1) * block_q - 1, block_k) + 1
            upper = jnp.minimum(last_needed, num_k_blocks)
            # blocks strictly below the causal diagonal AND inside kv_valid
            # need no mask at all: (j+1)*block_k <= qi*block_q + 1 keeps
            # every column <= every row of this q tile
            full_upper = jnp.minimum(
                lax.div(qi * block_q + 1, block_k), kv_valid // block_k
            )
        else:
            upper = num_k_blocks
            full_upper = kv_valid // block_k  # static

        m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
        l0 = jnp.zeros((block_q, 1), jnp.float32)
        acc0 = jnp.zeros((block_q, d), jnp.float32)

        row_ids = qi * block_q + lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )

        def body(j, carry, *, masked, q=q, hh=hh):
            m, l, acc = carry
            k_blk = k_ref[hh, pl.ds(j * block_k, block_k), :]  # [BK, D]
            v_blk = v_ref[hh, pl.ds(j * block_k, block_k), :]
            s = lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if masked:
                col_ids = j * block_k + lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 1
                )
                valid = col_ids < kv_valid
                if causal:
                    valid = valid & (col_ids <= row_ids)
                s = jnp.where(valid, s, _NEG_INF)

            m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
            p = jnp.exp2(s - m_new)
            corr = jnp.exp2(m - m_new)
            l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
            pv = lax.dot_general(
                p.astype(v_blk.dtype),
                v_blk,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return m_new, l_new, acc * corr + pv

        carry = lax.fori_loop(
            0, full_upper, functools.partial(body, masked=False), (m0, l0, acc0)
        )
        m, l, acc = lax.fori_loop(
            full_upper, upper, functools.partial(body, masked=True), carry
        )

        r = 1.0 / jnp.where(l == 0.0, 1.0, l)
        o_val = (acc * r).astype(o_ref.dtype)
        if dense_out:
            dense_vals.append(o_val)
        else:
            o_ref[hh] = o_val
        if with_lse:
            lse = jnp.where(l == 0.0, _NEG_INF, m * _LN2 - jnp.log(r))
            lse_ref[0, hh] = lse[:, 0]  # lane-major [BQ]

    if dense_out:
        o_ref[0] = (
            dense_vals[0]
            if hp == 1
            else jnp.concatenate(dense_vals, axis=-1)
        )


def _to_bhsd(x: jnp.ndarray, layout: str) -> jnp.ndarray:
    """-> [B*H, S, D]. layout 'bshd' needs a transpose; 'bhsd' is a free
    reshape — producers can emit [B,H,S,D] directly from the projection
    einsum ('bsc,chd->bhsd'), which XLA fuses into the matmul output."""
    if layout == "bhsd":
        b, h, s, d = x.shape
        return x.reshape(b * h, s, d)
    b, s, h, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * h, s, d)


def _from_bhsd(x: jnp.ndarray, b: int, h: int, layout: str) -> jnp.ndarray:
    bh, s, d = x.shape
    if layout == "bhsd":
        return x.reshape(b, h, s, d)
    return x.reshape(b, h, s, d).transpose(0, 2, 1, 3)


def _dims(shape, layout: str):
    """(batch, seq, heads, head_dim) from a q/k/v shape in either layout."""
    if layout == "bhsd":
        b, h, s, d = shape
    else:
        b, s, h, d = shape
    return b, s, h, d


def _kv_index(bh, hq: int, hkv: int):
    """q row -> kv row (GQA group mapping)."""
    g = hq // hkv
    return (bh // hq) * hkv + (bh % hq) // g


def _fwd(
    q: jnp.ndarray,  # [B, Sq, Hq, D] ('bshd') or [B, Hq, Sq, D] ('bhsd')
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    with_lse: bool,
    layout: str = "bshd",
    kv_valid: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    b, sq_orig, hq, d = _dims(q.shape, layout)
    _, skv_orig, hkv, _ = _dims(k.shape, layout)
    # explicit kv_valid < S means the tail holds caller data (garbage pad
    # tokens), not kernel-added zeros: it must be masked, not corrected
    mask_tail = kv_valid is not None and kv_valid < skv_orig
    if kv_valid is None:
        kv_valid = skv_orig

    q2 = _pad_dim(_to_bhsd(q, layout), 1, block_q)
    k2 = _pad_dim(_to_bhsd(k, layout), 1, block_k)
    v2 = _pad_dim(_to_bhsd(v, layout), 1, block_k)
    sq, skv = q2.shape[1], k2.shape[1]
    nq = sq // block_q

    # MHA (no GQA grouping): process 2 heads per program so VPU softmax of
    # one overlaps MXU matmuls of the other; GQA keeps hp=1 (a 2-row kv
    # block would span kv-head boundaries)
    hp = 2 if (hq == hkv and (b * hq) % 2 == 0) else 1

    q_spec = pl.BlockSpec(
        (hp, block_q, d), lambda bh, qi: (bh, qi, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (hp, skv, d),
        lambda bh, qi: (_kv_index(bh, hq, hkv) if hp == 1 else bh, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out_specs = [q_spec]
    out_shape = [jax.ShapeDtypeStruct((b * hq, sq, d), q.dtype)]
    if with_lse:
        # lane-major lse, shaped [B*Hq/hp, hp, Sq] so the trailing block dims
        # (hp, block_q) equal/divide the array dims per Mosaic tiling rules;
        # reshaped to [B*Hq, Sq] after the call (contiguous, free)
        out_specs.append(
            pl.BlockSpec(
                (1, hp, block_q),
                lambda bh, qi: (bh, 0, qi),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b * hq // hp, hp, sq), jnp.float32)
        )

    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            scale=scale,
            causal=causal,
            kv_valid=kv_valid,
            block_k=block_k,
            hp=hp,
            with_lse=with_lse,
            mask_tail=mask_tail,
            pf16=PF16_INFERENCE,
        ),
        grid=((b * hq) // hp, nq),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * skv * d,
            bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
            transcendentals=b * hq * sq * skv,
        ),
    )(q2, k2, v2)
    out = outs[0]
    lse = outs[1].reshape(b * hq, sq) if with_lse else None
    out = _from_bhsd(out, b, hq, layout)
    out = out[:, :, :sq_orig] if layout == "bhsd" else out[:, :sq_orig]
    return out, lse


# --------------------------------------------------------------- backward ---


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, causal, kv_valid, block_k, mask_tail=False,
):
    """Zero-padded kv columns need NO masking (k rows are zero, so ds@k
    contributes exactly zero whatever p is) — but caller-pre-padded tails
    (mask_tail) hold garbage and must be masked like the causal band."""
    c = scale * _LOG2E
    q = q_ref[0] * c
    do = do_ref[0].astype(jnp.float32)
    # stats stored lane-major [BQ]: relayout to column vectors (cheap, BQ
    # elts). Fully-masked rows (pre-padded q beyond kv_valid) carry
    # lse = -1e30; map them to +1e30 so exp2(s - lse) underflows to 0
    # instead of overflowing to inf
    lse_raw = lse_ref[0, 0][:, None]
    lse2 = jnp.where(lse_raw < -1e29, 1e30, lse_raw * _LOG2E)
    delta = delta_ref[0, 0][:, None]
    block_q = q.shape[0]
    qi = pl.program_id(1)
    num_k_blocks = _cdiv(kv_valid, block_k)
    if causal:
        last_needed = lax.div((qi + 1) * block_q - 1, block_k) + 1
        upper = jnp.minimum(last_needed, num_k_blocks)
        # blocks strictly below the diagonal: every col <= every row
        full_upper = jnp.minimum(lax.div(qi * block_q + 1, block_k), upper)
    else:
        upper = num_k_blocks
        full_upper = num_k_blocks
    if mask_tail:
        # garbage tail: only whole blocks below kv_valid may run unmasked
        full_upper = jnp.minimum(full_upper, kv_valid // block_k)

    row_ids = qi * block_q + lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(j, dq, *, masked):
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp2(s - lse2)
        if masked:
            col_ids = j * block_k + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            )
            valid = col_ids <= row_ids if causal else col_ids >= 0
            if mask_tail:
                valid = valid & (col_ids < kv_valid)
            p = jnp.where(valid, p, 0.0)
        dp = lax.dot_general(
            do, v_blk.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq_inc = lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dq + dq_inc

    dq = lax.fori_loop(
        0, full_upper, functools.partial(body, masked=False),
        jnp.zeros((block_q, q.shape[1]), jnp.float32),
    )
    if causal or mask_tail:
        dq = lax.fori_loop(
            full_upper, upper, functools.partial(body, masked=True), dq
        )
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale, causal, kv_valid, block_q, sq_valid, mask_tail=False,
):
    """Padding needs NO masking here: padded q rows have do=0 and delta=0, so
    both their dv (p^T@do) and dk (ds@q with ds = p*(do·v - delta)) vanish,
    and garbage dk/dv rows at padded kv positions are sliced away by the
    caller. Only the causal diagonal band is masked."""
    c = scale * _LOG2E
    k_blk = k_ref[0]  # [BK, D]
    v_blk = v_ref[0]
    block_k = k_blk.shape[0]
    ki = pl.program_id(1)
    num_q_blocks = _cdiv(sq_valid, block_q)

    col_ids = ki * block_k + lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    def body(qi, carry, *, masked):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), :] * c
        do = do_ref[0, pl.ds(qi * block_q, block_q), :].astype(jnp.float32)
        lse_raw = lse_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        lse2 = jnp.where(lse_raw < -1e29, 1e30, lse_raw * _LOG2E)
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        s = lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        p = jnp.exp2(s - lse2)
        if masked:
            row_ids = qi * block_q + lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            )
            valid = col_ids <= row_ids if causal else col_ids >= 0
            if mask_tail:
                valid = valid & (col_ids < kv_valid)
            p = jnp.where(valid, p, 0.0)
        dv_inc = lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dp = lax.dot_general(
            do, v_blk.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dk_inc = lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dk + dk_inc, dv + dv_inc

    d = k_blk.shape[1]
    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    if mask_tail:
        # garbage tail: every q block masks col >= kv_valid (and the causal
        # band); correctness over speed — only callers that pre-pad hit this
        dk, dv = lax.fori_loop(
            lax.div(ki * block_k, block_q) if causal else 0,
            num_q_blocks,
            functools.partial(body, masked=True),
            (dk0, dv0),
        )
    elif causal:
        first_needed = lax.div(ki * block_k, block_q)
        # first q block fully below the diagonal wrt this kv block:
        # qi*block_q >= (ki+1)*block_k - 1
        first_full = jnp.minimum(
            lax.div((ki + 1) * block_k - 2 + block_q, block_q), num_q_blocks
        )
        carry = lax.fori_loop(
            first_needed, first_full, functools.partial(body, masked=True),
            (dk0, dv0),
        )
        dk, dv = lax.fori_loop(
            first_full, num_q_blocks, functools.partial(body, masked=False),
            carry,
        )
    else:
        dk, dv = lax.fori_loop(
            0, num_q_blocks, functools.partial(body, masked=False), (dk0, dv0)
        )
    # q was staged as q*c with c = scale*log2e for the exp2 softmax; dk wants
    # plain scale*q in ds@q, so divide the fold back out
    dk_ref[0] = (dk * (1.0 / _LOG2E)).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _bwd(causal, scale, block_q, block_k, layout, kv_valid, residuals, dout):
    q, k, v, out, lse = residuals  # lse: [B*Hq, Sq_pad] natural-log units
    b, sq_orig, hq, d = _dims(q.shape, layout)
    _, skv_orig, hkv, _ = _dims(k.shape, layout)
    # explicit kv_valid < S means the tail holds caller data (garbage pad
    # tokens), not kernel-added zeros: it must be masked, not corrected
    mask_tail = kv_valid is not None and kv_valid < skv_orig
    if kv_valid is None:
        kv_valid = skv_orig
    g = hq // hkv

    delta = jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [B, Sq, Hq] ('bshd') or [B, Hq, Sq] ('bhsd')
    if layout == "bhsd":
        delta = delta.reshape(b * hq, sq_orig)
    else:
        delta = delta.transpose(0, 2, 1).reshape(b * hq, sq_orig)

    q2 = _pad_dim(_to_bhsd(q, layout), 1, block_q)
    k2 = _pad_dim(_to_bhsd(k, layout), 1, block_k)
    v2 = _pad_dim(_to_bhsd(v, layout), 1, block_k)
    do2 = _pad_dim(_to_bhsd(dout, layout), 1, block_q)
    # stats shaped [B*Hq, 1, Sq]: trailing block dims (1, block_q) satisfy
    # Mosaic tiling (dim -2 equals the array dim); a 2D (1, block_q) block of
    # a [B*Hq, Sq] array does NOT lower. lse arrives padded at the FORWARD's
    # block size, which may differ (causal fwd prefers 256-row q tiles) —
    # re-pad from the true length
    lse2 = _pad_dim(lse[:, :sq_orig], 1, block_q)[:, None, :]
    delta2 = _pad_dim(delta, 1, block_q)[:, None, :]
    sq, skv = q2.shape[1], k2.shape[1]
    nq, nk = sq // block_q, skv // block_k

    qblk = pl.BlockSpec(
        (1, block_q, d), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
    )
    qfull = pl.BlockSpec(
        (1, sq, d), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM
    )
    kvfull = pl.BlockSpec(
        (1, skv, d),
        lambda bh, i: (_kv_index(bh, hq, hkv), 0, 0),
        memory_space=pltpu.VMEM,
    )
    kvblk = pl.BlockSpec(
        (1, block_k, d),
        lambda bh, i: (_kv_index(bh, hq, hkv), i, 0),
        memory_space=pltpu.VMEM,
    )
    stat_blk = pl.BlockSpec(
        (1, 1, block_q), lambda bh, i: (bh, 0, i), memory_space=pltpu.VMEM
    )
    stat_full = pl.BlockSpec(
        (1, 1, sq), lambda bh, i: (bh, 0, 0), memory_space=pltpu.VMEM
    )
    outblk_q = pl.BlockSpec(
        (1, block_k, d), lambda bh, i: (bh, i, 0), memory_space=pltpu.VMEM
    )

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel,
            scale=scale,
            causal=causal,
            kv_valid=kv_valid,
            block_k=block_k,
            mask_tail=mask_tail,
        ),
        grid=(b * hq, nq),
        in_specs=[qblk, kvfull, kvfull, qblk, stat_blk, stat_blk],
        out_specs=qblk,
        out_shape=jax.ShapeDtypeStruct((b * hq, sq, d), q.dtype),
    )(q2, k2, v2, do2, lse2, delta2)

    # dk/dv per *query* head, then group-summed to kv heads.
    dk_q, dv_q = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel,
            scale=scale,
            causal=causal,
            kv_valid=kv_valid,
            block_q=block_q,
            sq_valid=sq_orig,
            mask_tail=mask_tail,
        ),
        grid=(b * hq, nk),
        in_specs=[qfull, kvblk, kvblk, qfull, stat_full, stat_full],
        out_specs=[outblk_q, outblk_q],
        out_shape=[
            jax.ShapeDtypeStruct((b * hq, skv, d), jnp.float32),
            jax.ShapeDtypeStruct((b * hq, skv, d), jnp.float32),
        ],
    )(q2, k2, v2, do2, lse2, delta2)

    dk2 = dk_q.reshape(b, hkv, g, skv, d).sum(axis=2)  # [B, Hkv, Skv, D]
    dv2 = dv_q.reshape(b, hkv, g, skv, d).sum(axis=2)
    if layout == "bhsd":
        dk_out = dk2[:, :, :skv_orig].astype(k.dtype)
        dv_out = dv2[:, :, :skv_orig].astype(v.dtype)
        dq_out = _from_bhsd(dq, b, hq, layout)[:, :, :sq_orig]
    else:
        dk_out = dk2.transpose(0, 2, 1, 3)[:, :skv_orig].astype(k.dtype)
        dv_out = dv2.transpose(0, 2, 1, 3)[:, :skv_orig].astype(v.dtype)
        dq_out = _from_bhsd(dq, b, hq, layout)[:, :sq_orig]
    return dq_out, dk_out, dv_out


# ------------------------------------------------------------------ entry ---


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash(q, k, v, causal, scale, block_q, block_k, layout, kv_valid):
    # primal (inference) path: no logsumexp output at all
    out, _ = _fwd(
        q, k, v, causal=causal, scale=scale, block_q=block_q, block_k=block_k,
        with_lse=False, layout=layout, kv_valid=kv_valid,
    )
    return out


def _flash_fwd(q, k, v, causal, scale, block_q, block_k, layout, kv_valid):
    # under AD the whole fwd+bwd pipeline prefers the larger tiles (the
    # 256-row causal q tiles that win for inference regressed the train
    # step; measured 4.24 -> 3.6-3.9 samples/s)
    if causal:
        block_q = max(block_q, DEFAULT_BLOCK_Q)
        block_k = max(block_k, DEFAULT_BLOCK_K)
    out, lse = _fwd(
        q, k, v, causal=causal, scale=scale, block_q=block_q, block_k=block_k,
        with_lse=True, layout=layout, kv_valid=kv_valid,
    )
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, scale, block_q, block_k, layout, kv_valid, residuals, dout):
    # the backward prefers the larger default tiles even when the causal
    # forward ran 256-row q blocks (finer bwd grids regressed the train
    # step 4.24 -> 3.63 samples/s; measured)
    bq = max(block_q, DEFAULT_BLOCK_Q) if causal else block_q
    bk = max(block_k, DEFAULT_BLOCK_K) if causal else block_k
    return _bwd(causal, scale, bq, bk, layout, kv_valid, residuals, dout)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool = False,
    mask: Optional[jnp.ndarray] = None,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    layout: str = "bshd",
    kv_valid: Optional[int] = None,
) -> jnp.ndarray:
    """Flash attention; q [B,Sq,Hq,D] / k,v [B,Skv,Hkv,D] ('bshd'), or the
    head-major 'bhsd' layout ([B,H,S,D]) that producers can emit directly
    from a projection einsum with no relayout. kv_valid masks trailing
    garbage tokens when the caller pre-pads S (static int). Differentiable.
    """
    assert mask is None, "masked attention uses the XLA path"
    sq = q.shape[2] if layout == "bhsd" else q.shape[1]
    skv = k.shape[2] if layout == "bhsd" else k.shape[1]
    if causal:
        assert sq == skv, "causal kernel assumes self-attention"
    scale = scale if scale is not None else q.shape[-1] ** -0.5

    def clamp_block(blk, s):
        blk = min(blk, _cdiv(s, 8) * 8)
        return max(8, blk)

    # shape-aware auto-tiling: moderate sequences take one full tile
    if not causal and skv <= _FULL_TILE_MAX:
        block_k = _cdiv(skv, 8) * 8
    if not causal and sq <= _FULL_TILE_MAX:
        block_q = _cdiv(sq, 8) * 8
    if causal and block_q == DEFAULT_BLOCK_Q:
        block_q = CAUSAL_BLOCK_Q
    block_q = clamp_block(block_q, sq)
    block_k = clamp_block(block_k, skv)
    return _flash(q, k, v, causal, scale, block_q, block_k, layout, kv_valid)


# ---------------------------------------------------- fused-qkv entry -------


def _fused_specs(ht, hq, hkv, skv, d, block_q, hp):
    """BlockSpecs viewing q/k/v inside ONE fused [B*Ht, S, D] array
    (Ht = hq + 2*hkv, heads ordered [q | k | v] as the projection emits
    them): three aliased views of the projection output, zero slice copies.
    Index maps translate the (head-block, q-block) grid onto rows of the
    fused array."""
    g = hq // hkv

    if hp == 2:  # MHA: two q heads per program
        hq2 = hq // 2

        # block index counts in units of hp rows: row b*ht + 2t -> block
        # b*(ht//2) + t
        def q_map(bh, qi):
            bi, t = bh // hq2, bh % hq2
            return bi * (ht // 2) + t, qi, 0

        def kv_map_k(bh, qi):
            bi, t = bh // hq2, bh % hq2
            return bi * (ht // 2) + hq // 2 + t, 0, 0

        def kv_map_v(bh, qi):
            bi, t = bh // hq2, bh % hq2
            return bi * (ht // 2) + (hq + hkv) // 2 + t, 0, 0
    else:  # GQA (or odd): one q head per program

        def q_map(bh, qi):
            bi, h = bh // hq, bh % hq
            return bi * ht + h, qi, 0

        def kv_map_k(bh, qi):
            bi, h = bh // hq, bh % hq
            return bi * ht + hq + h // g, 0, 0

        def kv_map_v(bh, qi):
            bi, h = bh // hq, bh % hq
            return bi * ht + hq + hkv + h // g, 0, 0

    q_spec = pl.BlockSpec((hp, block_q, d), q_map, memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((hp, skv, d), kv_map_k, memory_space=pltpu.VMEM)
    v_spec = pl.BlockSpec((hp, skv, d), kv_map_v, memory_space=pltpu.VMEM)
    return q_spec, k_spec, v_spec


def _fwd_qkv(
    qkv: jnp.ndarray,  # [B, Ht, S, D], heads ordered [q | k | v]
    hq: int,
    hkv: int,
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    with_lse: bool,
    kv_valid: Optional[int],
    dense_out: bool = False,  # emit [B, S, Hq*D] (see _fwd_kernel)
):
    b, ht, s, d = qkv.shape
    assert ht == hq + 2 * hkv
    mask_tail = kv_valid is not None and kv_valid < s
    if kv_valid is None:
        kv_valid = s
    qkv3 = _pad_dim(qkv.reshape(b * ht, s, d), 1, max(block_q, block_k))
    sq = qkv3.shape[1]
    nq = sq // block_q

    hp = 2 if (hq == hkv and hq % 2 == 0 and ht % 2 == 0) else 1
    assert not (dense_out and (with_lse or (hp * d) % 128)), (hp, d)
    q_spec, k_spec, v_spec = _fused_specs(ht, hq, hkv, sq, d, block_q, hp)
    if dense_out:
        # each program writes its hp heads' columns of the dense row block:
        # block (1, BQ, hp*D) of a [B, S, Hq*D] array at column-block
        # (head-block index); disjoint across programs
        hpg = hq // hp

        out_specs = [
            pl.BlockSpec(
                (1, block_q, hp * d),
                lambda bh, qi: (bh // hpg, qi, bh % hpg),
                memory_space=pltpu.VMEM,
            )
        ]
        out_shape = [jax.ShapeDtypeStruct((b, sq, hq * d), qkv.dtype)]
    else:
        out_specs = [
            pl.BlockSpec(
                (hp, block_q, d), lambda bh, qi: (bh, qi, 0),
                memory_space=pltpu.VMEM,
            )
        ]
        out_shape = [jax.ShapeDtypeStruct((b * hq, sq, d), qkv.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec(
                (1, hp, block_q), lambda bh, qi: (bh, 0, qi),
                memory_space=pltpu.VMEM,
            )
        )
        out_shape.append(
            jax.ShapeDtypeStruct((b * hq // hp, hp, sq), jnp.float32)
        )

    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            scale=scale,
            causal=causal,
            kv_valid=kv_valid,
            block_k=block_k,
            hp=hp,
            with_lse=with_lse,
            mask_tail=mask_tail,
            pf16=PF16_INFERENCE,
            dense_out=dense_out,
        ),
        grid=((b * hq) // hp, nq),
        in_specs=[q_spec, k_spec, v_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * sq * d,
            bytes_accessed=2 * qkv.size * qkv.dtype.itemsize,
            transcendentals=b * hq * sq * sq,
        ),
    )(qkv3, qkv3, qkv3)
    if dense_out:
        return outs[0][:, :s], None
    out = outs[0].reshape(b, hq, sq, d)[:, :, :s]
    lse = outs[1].reshape(b * hq, sq) if with_lse else None
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5, 6, 7))
def _flash_qkv(qkv, hq, hkv, causal, scale, block_q, block_k, kv_valid):
    out, _ = _fwd_qkv(
        qkv, hq, hkv, causal=causal, scale=scale, block_q=block_q,
        block_k=block_k, with_lse=False, kv_valid=kv_valid,
    )
    return out


def _flash_qkv_fwd(qkv, hq, hkv, causal, scale, block_q, block_k, kv_valid):
    if causal:  # see _flash_fwd
        block_q = max(block_q, DEFAULT_BLOCK_Q)
        block_k = max(block_k, DEFAULT_BLOCK_K)
    out, lse = _fwd_qkv(
        qkv, hq, hkv, causal=causal, scale=scale, block_q=block_q,
        block_k=block_k, with_lse=True, kv_valid=kv_valid,
    )
    return out, (qkv, out, lse)


def _flash_qkv_bwd(hq, hkv, causal, scale, block_q, block_k, kv_valid,
                   residuals, dout):
    qkv, out, lse = residuals
    # backward reuses the per-tensor kernels on head-major views (the slice
    # copies here only run under AD, where dk/dv writes dwarf them)
    q = qkv[:, :hq]
    k = qkv[:, hq : hq + hkv]
    v = qkv[:, hq + hkv :]
    bq = max(block_q, DEFAULT_BLOCK_Q) if causal else block_q
    bk = max(block_k, DEFAULT_BLOCK_K) if causal else block_k
    dq, dk, dv = _bwd(
        causal, scale, bq, bk, "bhsd", kv_valid,
        (q, k, v, out, lse), dout,
    )
    return (jnp.concatenate([dq, dk, dv], axis=1),)


_flash_qkv.defvjp(_flash_qkv_fwd, _flash_qkv_bwd)


def flash_attention_qkv(
    qkv: jnp.ndarray,  # [B, hq + 2*hkv, S, D], heads ordered [q | k | v]
    hq: int,
    hkv: int,
    *,
    causal: bool = False,
    scale: Optional[float] = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    kv_valid: Optional[int] = None,
    out_layout: str = "bhsd",
) -> jnp.ndarray:
    """Flash attention straight off a fused head-major qkv projection:
    q/k/v are three BlockSpec views into ONE array, so the per-tensor slice
    copies disappear. Returns [B, hq, S, D] (out_layout='bhsd',
    differentiable) or [B, S, hq*D] (out_layout='bsd': the kernel writes the
    out-projection's dense input form directly — W8A8 serving path, NOT
    differentiable)."""
    d = qkv.shape[-1]
    s = qkv.shape[2]
    scale = scale if scale is not None else d**-0.5
    if not causal and s <= _FULL_TILE_MAX:
        block_q = block_k = _cdiv(s, 8) * 8
    if causal and block_q == DEFAULT_BLOCK_Q:
        block_q = CAUSAL_BLOCK_Q
    block_q = max(8, min(block_q, _cdiv(s, 8) * 8))
    block_k = max(8, min(block_k, _cdiv(s, 8) * 8))
    if out_layout == "bsd":
        out, _ = _fwd_qkv(
            qkv, hq, hkv, causal=causal, scale=scale, block_q=block_q,
            block_k=block_k, with_lse=False, kv_valid=kv_valid,
            dense_out=True,
        )
        return out
    return _flash_qkv(qkv, hq, hkv, causal, scale, block_q, block_k, kv_valid)


def dense_out_supported(hq: int, hkv: int, d: int, ht: int) -> bool:
    """Shapes where the 'bsd' dense output layout is available: the head
    block's column width must be a whole lane tile."""
    hp = 2 if (hq == hkv and hq % 2 == 0 and ht % 2 == 0) else 1
    return (hp * d) % 128 == 0 and hq % hp == 0

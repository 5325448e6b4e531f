"""Pallas TPU flash-attention (forward + backward).

TPU-native replacement for the reference's CUDA flash-attn kernels
(`/root/reference/internvl/model/internvl_chat/flash_attention.py` for the
non-causal ViT path, `modeling_internlm2.py:444-614` for the causal GQA
decoder path). Design follows the standard online-softmax tiling:

- grid (B, Hq, num_q_blocks); each program owns one q tile in VMEM and
  streams K/V tiles for its kv head (GQA maps q head h -> kv head h // G in
  the BlockSpec index map, so repeated K/V heads are never materialized).
- running (row-max m, row-sum l, accumulator acc) carried through a
  `lax.fori_loop`; all softmax math in fp32 on the VPU, the two matmuls per
  tile (q·kT and p·v) on the MXU with fp32 accumulation.
- causal masking trims the kv loop to the blocks at-or-below the diagonal;
  tail keys beyond the true (pre-padding) length are masked with a static
  `kv_valid` bound, replacing cu_seqlens/varlen packing.
- backward is the standard two-kernel scheme (dq; dk/dv) using the saved
  logsumexp and delta = rowsum(dout * out). dk/dv are emitted per *query*
  head and group-summed outside the kernel (G is small: 4 for InternLM2
  32q/8kv heads).

Sequence lengths are padded to the tile size outside the kernel; padded query
rows produce garbage that callers slice off, padded key columns are masked.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 128
DEFAULT_BLOCK_K = 128
_NEG_INF = -1e30


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _pad_to(x: jnp.ndarray, axis: int, multiple: int) -> jnp.ndarray:
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
    if d not in (64, 128, 256):
        return False
    # tiny shapes aren't worth a kernel launch and break tile minimums
    if sq < 8 or skv < 8:
        return False
    return True


# ---------------------------------------------------------------- forward ---


def _fwd_kernel(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale, causal, kv_valid, block_k, sq, skv
):
    q = q_ref[0, :, 0, :]  # [BQ, D]
    block_q = q.shape[0]
    qi = pl.program_id(2)
    num_k_blocks = _cdiv(kv_valid, block_k)

    if causal:
        # self-attention only (sq == skv): highest kv block this q tile needs
        last_needed = lax.div((qi + 1) * block_q - 1, block_k) + 1
        upper = jnp.minimum(last_needed, num_k_blocks)
    else:
        upper = num_k_blocks

    m0 = jnp.full((block_q, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, q.shape[1]), jnp.float32)

    row_ids = qi * block_q + lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(j, carry):
        m, l, acc = carry
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), 0, :]  # [BK, D]
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), 0, :]
        s = jax.lax.dot_general(
            q,
            k_blk,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, BK]
        s = s * scale

        col_ids = j * block_k + lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        valid = col_ids < kv_valid
        if causal:
            valid = valid & (col_ids <= row_ids)
        s = jnp.where(valid, s, _NEG_INF)

        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        corr = jnp.exp(m - m_new)
        l_new = l * corr + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_blk.dtype),
            v_blk,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_new = acc * corr + pv
        return m_new, l_new, acc_new

    m, l, acc = lax.fori_loop(0, upper, body, (m0, l0, acc0))

    l_safe = jnp.where(l == 0.0, 1.0, l)
    o_ref[0, :, 0, :] = (acc / l_safe).astype(o_ref.dtype)
    lse = m + jnp.log(l_safe)
    lse = jnp.where(l == 0.0, _NEG_INF, lse)
    lse_ref[0, 0, :] = lse[:, 0]


def _fwd(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, sq_orig, hq, d = q.shape
    _, skv_orig, hkv, _ = k.shape
    g = hq // hkv

    q = _pad_to(q, 1, block_q)
    k = _pad_to(k, 1, block_k)
    v = _pad_to(v, 1, block_k)
    sq, skv = q.shape[1], k.shape[1]
    nq = sq // block_q

    kernel = functools.partial(
        _fwd_kernel,
        scale=scale,
        causal=causal,
        kv_valid=skv_orig,
        block_k=block_k,
        sq=sq,
        skv=skv,
    )
    out, lse = pl.pallas_call(
        kernel,
        grid=(b, hq, nq),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, 1, d), lambda bi, h, qi: (bi, qi, h, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, skv, 1, d), lambda bi, h, qi: (bi, 0, h // g, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, skv, 1, d), lambda bi, h, qi: (bi, 0, h // g, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, block_q, 1, d), lambda bi, h, qi: (bi, qi, h, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, block_q), lambda bi, h, qi: (bi, h, qi),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, hq, d), q.dtype),
            jax.ShapeDtypeStruct((b, hq, sq), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * b * hq * sq * skv * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize,
            transcendentals=b * hq * sq * skv,
        ),
    )(q, k, v)
    return out[:, :sq_orig], lse


# --------------------------------------------------------------- backward ---


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale, causal, kv_valid, block_k,
):
    q = q_ref[0, :, 0, :]
    do = do_ref[0, :, 0, :].astype(jnp.float32)
    lse = lse_ref[0, 0, :][:, None]
    delta = delta_ref[0, 0, :][:, None]
    block_q = q.shape[0]
    qi = pl.program_id(2)
    num_k_blocks = _cdiv(kv_valid, block_k)
    if causal:
        last_needed = lax.div((qi + 1) * block_q - 1, block_k) + 1
        upper = jnp.minimum(last_needed, num_k_blocks)
    else:
        upper = num_k_blocks

    row_ids = qi * block_q + lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)

    def body(j, dq):
        k_blk = k_ref[0, pl.ds(j * block_k, block_k), 0, :]
        v_blk = v_ref[0, pl.ds(j * block_k, block_k), 0, :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col_ids = j * block_k + lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 1
        )
        valid = col_ids < kv_valid
        if causal:
            valid = valid & (col_ids <= row_ids)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dp = jax.lax.dot_general(
            do, v_blk.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dq_inc = jax.lax.dot_general(
            ds.astype(k_blk.dtype), k_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dq + dq_inc

    dq = lax.fori_loop(
        0, upper, body, jnp.zeros((block_q, q.shape[1]), jnp.float32)
    )
    dq_ref[0, :, 0, :] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale, causal, kv_valid, block_q, sq_valid,
):
    k_blk = k_ref[0, :, 0, :]  # [BK, D]
    v_blk = v_ref[0, :, 0, :]
    block_k = k_blk.shape[0]
    ki = pl.program_id(2)
    num_q_blocks = _cdiv(sq_valid, block_q)

    if causal:
        # lowest q block that can see this kv block
        first_needed = lax.div(ki * block_k, block_q)
    else:
        first_needed = 0

    col_ids = ki * block_k + lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)

    def body(qi, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qi * block_q, block_q), 0, :]
        do = do_ref[0, pl.ds(qi * block_q, block_q), 0, :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(qi * block_q, block_q)][:, None]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        row_ids = qi * block_q + lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0
        )
        valid = col_ids < kv_valid
        if causal:
            valid = valid & (col_ids <= row_ids)
        p = jnp.where(valid, jnp.exp(s - lse), 0.0)
        dv_inc = jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BK, D]
        dp = jax.lax.dot_general(
            do, v_blk.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta)
        dk_inc = jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BK, D]
        return dk + dk_inc, dv + dv_inc

    d = k_blk.shape[1]
    dk0 = jnp.zeros((block_k, d), jnp.float32)
    dv0 = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = lax.fori_loop(first_needed, num_q_blocks, body, (dk0, dv0))
    dk_ref[0, :, 0, :] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0, :, 0, :] = dv.astype(dv_ref.dtype)


def _bwd(
    causal, scale, block_q, block_k, residuals, dout
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    q, k, v, out, lse = residuals
    b, sq_orig, hq, d = q.shape
    _, skv_orig, hkv, _ = k.shape
    g = hq // hkv

    delta = jnp.sum(
        dout.astype(jnp.float32) * out.astype(jnp.float32), axis=-1
    )  # [B, Sq, Hq]
    delta = jnp.transpose(delta, (0, 2, 1))  # [B, Hq, Sq]

    q = _pad_to(q, 1, block_q)
    k = _pad_to(k, 1, block_k)
    v = _pad_to(v, 1, block_k)
    do = _pad_to(dout, 1, block_q)
    lse = _pad_to(lse, 2, block_q)
    delta = _pad_to(delta, 2, block_q)
    sq, skv = q.shape[1], k.shape[1]
    nq, nk = sq // block_q, skv // block_k

    q_spec = pl.BlockSpec(
        (1, block_q, 1, d), lambda bi, h, i: (bi, i, h, 0), memory_space=pltpu.VMEM
    )
    qfull_spec = pl.BlockSpec(
        (1, sq, 1, d), lambda bi, h, i: (bi, 0, h, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, skv, 1, d), lambda bi, h, i: (bi, 0, h // g, 0), memory_space=pltpu.VMEM
    )
    kvblk_spec = pl.BlockSpec(
        (1, block_k, 1, d), lambda bi, h, i: (bi, i, h // g, 0),
        memory_space=pltpu.VMEM,
    )
    stat_blk_spec = pl.BlockSpec(
        (1, 1, block_q), lambda bi, h, i: (bi, h, i), memory_space=pltpu.VMEM
    )
    stat_full_spec = pl.BlockSpec(
        (1, 1, sq), lambda bi, h, i: (bi, h, 0), memory_space=pltpu.VMEM
    )

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel,
            scale=scale,
            causal=causal,
            kv_valid=skv_orig,
            block_k=block_k,
        ),
        grid=(b, hq, nq),
        in_specs=[q_spec, kv_spec, kv_spec, q_spec, stat_blk_spec, stat_blk_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, sq, hq, d), q.dtype),
    )(q, k, v, do, lse, delta)

    # dk/dv emitted per *query* head, then group-summed to kv heads.
    dk_q, dv_q = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel,
            scale=scale,
            causal=causal,
            kv_valid=skv_orig,
            block_q=block_q,
            sq_valid=sq_orig,
        ),
        grid=(b, hq, nk),
        in_specs=[
            qfull_spec,
            kvblk_spec,
            kvblk_spec,
            qfull_spec,
            stat_full_spec,
            stat_full_spec,
        ],
        out_specs=[
            pl.BlockSpec(
                (1, block_k, 1, d), lambda bi, h, i: (bi, i, h, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, block_k, 1, d), lambda bi, h, i: (bi, i, h, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, skv, hq, d), jnp.float32),
            jax.ShapeDtypeStruct((b, skv, hq, d), jnp.float32),
        ],
    )(q, k, v, do, lse, delta)

    dk = dk_q.reshape(b, skv, hkv, g, d).sum(axis=3).astype(k.dtype)
    dv = dv_q.reshape(b, skv, hkv, g, d).sum(axis=3).astype(v.dtype)
    return (
        dq[:, :sq_orig],
        dk[:, :skv_orig],
        dv[:, :skv_orig],
    )


# ------------------------------------------------------------------ entry ---


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, causal, scale, block_q, block_k):
    out, _ = _fwd(q, k, v, causal=causal, scale=scale, block_q=block_q, block_k=block_k)
    return out


def _flash_fwd(q, k, v, causal, scale, block_q, block_k):
    out, lse = _fwd(
        q, k, v, causal=causal, scale=scale, block_q=block_q, block_k=block_k
    )
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, scale, block_q, block_k, residuals, dout):
    return _bwd(causal, scale, block_q, block_k, residuals, dout)


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
) -> jnp.ndarray:
    """Flash attention; q [B,Sq,Hq,D], k/v [B,Skv,Hkv,D]. Differentiable."""
    assert mask is None, "masked attention uses the XLA path"
    if causal:
        assert q.shape[1] == k.shape[1], "causal kernel assumes self-attention"
    scale = scale if scale is not None else q.shape[-1] ** -0.5
    block_q = min(block_q, max(8, q.shape[1]))
    block_k = min(block_k, max(8, k.shape[1]))
    return _flash(q, k, v, causal, scale, block_q, block_k)

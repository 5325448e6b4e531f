"""Probe: does an int8 KV cache beat bf16 at decode shapes on this chip?

Decode attention at bs=8 / seq 2161 reads the whole per-sample cache each
step (~212 MB/sample bf16 at 2B scale) — at bs>=8 this rivals the (batch-
amortized) weight reads. int8 halves the bytes IF the dequant can ride the
read instead of materializing a bf16 copy in HBM.

Three candidate read paths, timed at the real decode shape:
  a) bf16 cache, plain einsum                     (status quo)
  b) int8 cache, mixed-dtype dot                  (XLA promotes — where?)
  c) int8 cache, explicit astype(bf16)*scale      (fusion or materialize?)
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

B, HKV, G, D, S = 8, 8, 2, 128, 2161


def timeit(fn, args, iters=50):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    r = None
    for _ in range(iters):
        r = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0])[..., :1]
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(B, 1, HKV, G, D)), jnp.bfloat16)
    k_bf16 = jnp.asarray(rng.normal(size=(B, S, HKV, D)), jnp.bfloat16)
    v_bf16 = jnp.asarray(rng.normal(size=(B, S, HKV, D)), jnp.bfloat16)
    k_i8 = jnp.asarray(rng.integers(-127, 127, (B, S, HKV, D)), jnp.int8)
    v_i8 = jnp.asarray(rng.integers(-127, 127, (B, S, HKV, D)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.01, 0.03, (B, S, HKV)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.01, 0.03, (B, S, HKV)), jnp.float32)

    @jax.jit
    def attn_bf16(q, k, v):
        lo = jnp.einsum(
            "bqhgd,bkhd->bhgqk", q, k, preferred_element_type=jnp.float32
        ) * (D**-0.5)
        p = jax.nn.softmax(lo, axis=-1).astype(jnp.bfloat16)
        return jnp.einsum(
            "bhgqk,bkhd->bqhgd", p, v, preferred_element_type=jnp.float32
        )

    @jax.jit
    def attn_i8_mixed(q, k, v, ks, vs):
        # mixed-dtype dot: int8 operand straight into the einsum, scale after
        lo = jnp.einsum(
            "bqhgd,bkhd->bhgqk",
            q,
            k,
            preferred_element_type=jnp.float32,
        ) * (D**-0.5)
        lo = lo * ks.transpose(0, 2, 1)[:, :, None, None, :]
        p = jax.nn.softmax(lo, axis=-1)
        # v path: contract int8 then scale needs per-k weighting — fold the
        # scale into p instead (p_k * vs_k), keeping v int8 in the dot
        pv = (p * vs.transpose(0, 2, 1)[:, :, None, None, :]).astype(
            jnp.bfloat16
        )
        return jnp.einsum(
            "bhgqk,bkhd->bqhgd", pv, v, preferred_element_type=jnp.float32
        )

    @jax.jit
    def attn_i8_deq(q, k, v, ks, vs):
        kd = k.astype(jnp.bfloat16) * ks[..., None].astype(jnp.bfloat16)
        vd = v.astype(jnp.bfloat16) * vs[..., None].astype(jnp.bfloat16)
        return attn_bf16.__wrapped__(q, kd, vd)

    for name, fn, args in [
        ("bf16", attn_bf16, (q, k_bf16, v_bf16)),
        ("int8-mixed-dot", attn_i8_mixed, (q, k_i8, v_i8, ks, vs)),
        ("int8-deq-explicit", attn_i8_deq, (q, k_i8, v_i8, ks, vs)),
    ]:
        try:
            dt = timeit(fn, args)
            bytes_cache = (
                2 * B * S * HKV * D * (2 if name == "bf16" else 1)
            )
            print(
                f"{name:20s} {dt*1e3:7.3f} ms  "
                f"eff-BW {bytes_cache/dt/1e9:6.1f} GB/s"
            )
        except Exception as e:
            print(f"{name:20s} FAILED: {repr(e)[:160]}")


if __name__ == "__main__":
    main()

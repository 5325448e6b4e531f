"""Autoregressive decode benchmark: tokens/sec through the fixed-cache
while-loop decoder (models/generation.py).

Times the REAL decode_loop (assessor-wrapped decode_step, one
`lax.while_loop` on device) on a pre-filled cache, prefill excluded: the
loop is compiled+run once to warm, then the second identical run is timed
end-to-end with a host readback. (The previous difference-of-two-generates
protocol was unstable through the tunnel — it reported 46 tok/s when the
warm loop actually runs at ~6.2 ms/token.)

Usage: python benchmarks/decode_bench.py [--batch 1] [--new_tokens 64]
       [--int8]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--new_tokens", type=int, default=64)
    ap.add_argument("--prefill", type=int, default=2097)
    ap.add_argument("--scale", default="2b", choices=["tiny", "2b", "8b"])
    ap.add_argument("--int8", action="store_true",
                    help="W8A16: int8 LLM weights (serving path)")
    ap.add_argument("--int4", action="store_true",
                    help="W4A16: nibble-packed int4 LLM weights, unpacked "
                         "in-kernel (ops/int8_matmul.int4_matmul)")
    ap.add_argument("--kv_int8", action="store_true",
                    help="int8 KV cache (ops/kv_quant.py): halves the "
                         "per-sample cache read — the second bandwidth term "
                         "at batched decode — and the cache footprint")
    args = ap.parse_args()

    from aigv_assessor_tpu.cli.common import LLM_2B
    from aigv_assessor_tpu.core.config import AssessorConfig
    from aigv_assessor_tpu.core.precision import Precision
    from aigv_assessor_tpu.models.assessor import AIGVAssessor
    from aigv_assessor_tpu.models.generation import GenerationConfig, decode_loop
    from aigv_assessor_tpu.models.internlm2 import KVCache

    if args.scale == "2b":
        cfg = AssessorConfig(llm=LLM_2B, stage=1).replace(img_context_token_id=7)
    elif args.scale == "8b":
        # InternVL2-8B class (InternLM2.5-7B decoder, the default LLMConfig).
        # bf16 weights are 15.4 GB — do not fit this 16 GB chip; --int4
        # (3.9 GB packed) is the scale's serving mode here.
        cfg = AssessorConfig(stage=1).replace(img_context_token_id=7)
    else:
        cfg = AssessorConfig.tiny(stage=1).replace(img_context_token_id=7)

    precision = Precision(int8_weights=args.int8, int4_weights=args.int4,
                          kv_int8=args.kv_int8)
    model = AIGVAssessor(cfg, precision)
    b = args.batch
    maxlen = args.prefill + args.new_tokens

    # zero weights via eval_shape (timing-equivalent); int8 kernels as int8
    img = 56 if args.scale == "tiny" else 448
    shapes = jax.eval_shape(
        model.init,
        jax.random.key(0),
        jnp.zeros((b, 4), jnp.int32),
        jnp.zeros((b, 1, img, img, 3), jnp.bfloat16),
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype if s.dtype == jnp.int8 else jnp.bfloat16),
        shapes,
    )

    cache = KVCache.init(cfg.llm, b, maxlen, quantized=args.kv_int8)
    cache = KVCache(
        k=cache.k, v=cache.v, index=jnp.asarray(args.prefill, jnp.int32)
    )
    kv_mask = jnp.ones((b, maxlen), bool)
    start = jnp.full((b,), args.prefill, jnp.int32)
    first = jnp.zeros((b,), jnp.int32)
    rng = jax.random.key(0)
    gcfg = GenerationConfig(max_new_tokens=args.new_tokens, eos_token_id=-1)

    print(f"compile+warm decode_loop ({args.scale}, int8={args.int8}, "
          f"int4={args.int4}, kv_int8={args.kv_int8})...",
          flush=True)
    out = decode_loop(model, params, first, cache, start, kv_mask, rng, gcfg)
    _ = np.asarray(out)  # full sync through the tunnel

    t0 = time.perf_counter()
    out = decode_loop(model, params, first, cache, start, kv_mask, rng, gcfg)
    _ = np.asarray(out)
    dt = time.perf_counter() - t0

    per_token = dt / args.new_tokens
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec",
                "value": round(b / per_token, 2),
                "unit": "tokens/sec (batch-aggregate)",
                "batch": b,
                "prefill": args.prefill,
                "scale": args.scale,
                "int8": args.int8,
                "int4": args.int4,
                "kv_int8": args.kv_int8,
                "ms_per_token": round(per_token * 1e3, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Autoregressive decode benchmark: tokens/sec through the fixed-cache
while-loop decoder (models/generation.py).

Exercises the full serving generate path on hardware: multimodal prefill
(8 frames + motion) then N greedy decode steps inside one `lax.while_loop`
— no per-token host round trips (critical through the tunneled chip).

Usage: python benchmarks/decode_bench.py [--batch 1] [--new_tokens 32]
"""

from __future__ import annotations

import argparse
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
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--new_tokens", type=int, default=32)
    ap.add_argument("--scale", default="2b", choices=["tiny", "2b"])
    args = ap.parse_args()

    from aigv_assessor_tpu.cli.common import LLM_2B
    from aigv_assessor_tpu.core.config import AssessorConfig
    from aigv_assessor_tpu.core.precision import Precision
    from aigv_assessor_tpu.models.assessor import AIGVAssessor
    from aigv_assessor_tpu.models.generation import GenerationConfig, generate

    if args.scale == "2b":
        cfg = AssessorConfig(llm=LLM_2B, stage=1).replace(img_context_token_id=7)
        image = 448
    else:
        cfg = AssessorConfig.tiny(stage=1).replace(img_context_token_id=7)
        image = 56

    model = AIGVAssessor(cfg, Precision())
    b, t = args.batch, args.frames
    n_ctx = t * cfg.num_image_token + 1
    seq = n_ctx + 48
    rng = np.random.default_rng(0)
    ids = rng.integers(10, cfg.llm.vocab_size, (b, seq))
    ids[:, 1 : 1 + n_ctx] = cfg.img_context_token_id
    px = rng.normal(size=(b, t, image, image, 3)).astype(np.float32)

    shapes = jax.eval_shape(
        model.init, jax.random.key(0), jnp.asarray(ids, jnp.int32), jnp.asarray(px)
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes
    )

    class Tok:
        eos_token_id = -1  # never stop (throughput measurement)

    gcfg = GenerationConfig(max_new_tokens=args.new_tokens, eos_token_id=-1)
    print(f"compile+first generate ({args.scale}, prefill {seq})...", flush=True)
    out = generate(model, params, Tok(), ids, px, gcfg=gcfg, with_motion=True)
    assert out.shape == (b, args.new_tokens)

    t0 = time.perf_counter()
    out = generate(model, params, Tok(), ids, px, gcfg=gcfg, with_motion=True)
    one = time.perf_counter() - t0  # prefill + decode + transfers

    n2 = args.new_tokens * 2
    gcfg2 = GenerationConfig(max_new_tokens=n2, eos_token_id=-1)
    _ = generate(model, params, Tok(), ids, px, gcfg=gcfg2, with_motion=True)
    t0 = time.perf_counter()
    _ = generate(model, params, Tok(), ids, px, gcfg=gcfg2, with_motion=True)
    two = time.perf_counter() - t0

    # difference isolates the extra decode tokens
    per_token = max((two - one) / args.new_tokens, 1e-9)
    print(
        json.dumps(
            {
                "metric": "decode_tokens_per_sec",
                "value": round(b / per_token, 2),
                "unit": "tokens/sec (batch-aggregate)",
                "batch": b,
                "prefill": seq,
                "scale": args.scale,
                "prefill_plus_first_run_s": round(one, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Full stage-2 scoring pipeline benchmark: videos scored/sec/chip.

BASELINE.md headline metric ("videos scored/sec/chip (stage2)"): one jitted
forward of the composite model — ViT encode of 8 frames + SlowFast motion +
InternLM2 teacher-forced pass + mlpscore read-out — on random weights at the
InternVL2-2B scale (ViT-300M + InternLM2-1.8B; the 8B does not fit a single
16GB v5e chip in bf16 with activations — it is a multi-chip serving target).

Timing uses the readback-sync protocol from bench.py (the tunneled chip's
block_until_ready does not fence).

Usage: python benchmarks/full_pipeline_bench.py [--batch 4] [--frames 8]
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
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--text_len", type=int, default=64)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--scale", default="2b", choices=["tiny", "2b"])
    args = ap.parse_args()

    from aigv_assessor_tpu.cli.common import LLM_2B
    from aigv_assessor_tpu.core.config import AssessorConfig
    from aigv_assessor_tpu.core.precision import Precision
    from aigv_assessor_tpu.models.assessor import AIGVAssessor

    if args.scale == "2b":
        cfg = AssessorConfig(llm=LLM_2B, stage=2).replace(img_context_token_id=7)
        image = 448
    else:
        cfg = AssessorConfig.tiny(stage=2).replace(img_context_token_id=7)
        image = 56

    model = AIGVAssessor(cfg, Precision())
    b, t = args.batch, args.frames
    n_ctx = t * cfg.num_image_token + 1
    seq = n_ctx + args.text_len
    rng = np.random.default_rng(0)
    ids = rng.integers(10, cfg.llm.vocab_size, (b, seq))
    ids[:, 1 : 1 + n_ctx] = cfg.img_context_token_id
    ids = jnp.asarray(ids, jnp.int32)
    px = jnp.asarray(
        rng.normal(size=(b, t, image, image, 3)), jnp.bfloat16
    )
    mask = jnp.ones((b, seq), bool)

    print(f"init {args.scale} params (seq={seq})...", flush=True)
    # zero-init via eval_shape: instant, and timing-equivalent for dense
    # matmuls (no data-dependent control flow in the forward); bf16 weights
    # as in serving
    shapes = jax.eval_shape(model.init, jax.random.key(0), ids, px)
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.bfloat16), shapes
    )

    @jax.jit
    def probe(params, ids, px, mask):
        out = model.apply(
            params, ids, px, attention_mask=mask, with_logits=False
        )
        return jnp.sum(out["score"].astype(jnp.float32))

    s = float(probe(params, ids, px, mask))
    assert np.isfinite(s)
    t0 = time.perf_counter()
    _ = float(probe(params, ids, px, mask))
    rtt1 = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = None
    for _ in range(args.iters):
        out = probe(params, ids, px, mask)
    _ = float(out)
    dt = time.perf_counter() - t0
    per_iter = (dt - rtt1) / (args.iters - 1)
    vps = b / per_iter
    print(
        json.dumps(
            {
                "metric": "videos_scored_per_sec_chip",
                "value": round(vps, 3),
                "unit": "videos/sec/chip",
                "batch": b,
                "frames": t,
                "seq": seq,
                "scale": args.scale,
                "ms_per_batch": round(per_iter * 1000, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

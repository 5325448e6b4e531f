"""Stage-1 training-step benchmark on real hardware.

BASELINE.md config #4 class (stage-1: spatiotemporal projector training on
frozen ViT + frozen LLM). Measures optimizer steps/sec and samples/sec for
the full jitted train step (forward + backward through both towers + masked
adamw update) at the 2B scale with per-layer remat.

Usage: python benchmarks/train_step_bench.py [--batch 2] [--frames 8]
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
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--text_len", type=int, default=64)
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--scale", default="2b", choices=["tiny", "2b"])
    ap.add_argument("--stage", type=int, default=1)
    args = ap.parse_args()

    from aigv_assessor_tpu.cli.common import LLM_2B
    from aigv_assessor_tpu.core.config import AssessorConfig
    from aigv_assessor_tpu.core.mesh import MeshConfig, make_mesh
    from aigv_assessor_tpu.core.precision import Precision
    from aigv_assessor_tpu.models.assessor import AIGVAssessor
    from aigv_assessor_tpu.train.trainer import TrainConfig, Trainer, microbatch

    if args.scale == "2b":
        cfg = AssessorConfig(llm=LLM_2B, stage=args.stage).replace(
            img_context_token_id=7,
            use_backbone_lora=8 if args.stage == 2 else 0,
            use_llm_lora=8 if args.stage == 2 else 0,
        )
        image = 448
    else:
        cfg = AssessorConfig.tiny(stage=args.stage).replace(img_context_token_id=7)
        image = 56

    model = AIGVAssessor(cfg, Precision(), remat=True)
    b, t = args.batch, args.frames
    n_ctx = t * cfg.num_image_token + 1
    seq = n_ctx + args.text_len
    rng = np.random.default_rng(0)
    ids = rng.integers(10, cfg.llm.vocab_size, (b, seq))
    ids[:, 1 : 1 + n_ctx] = cfg.img_context_token_id
    labels = np.full((b, seq), -100)
    labels[:, -16:] = rng.integers(10, cfg.llm.vocab_size, (b, 16))
    batch = {
        "input_ids": ids.astype(np.int32),
        "labels": labels.astype(np.int32),
        "attention_mask": np.ones((b, seq), bool),
        "pixel_values": rng.normal(size=(b, t, image, image, 3)).astype(np.float32),
        "mos": rng.uniform(0, 1, (b,)).astype(np.float32),
    }

    print(f"init {args.scale} stage-{args.stage} (seq={seq})...", flush=True)
    example = (
        jnp.asarray(batch["input_ids"]),
        jnp.asarray(batch["pixel_values"]),
    )
    shapes = jax.eval_shape(
        lambda: model.init(
            jax.random.key(0), example[0], example[1],
            labels=jnp.asarray(batch["labels"]), mos=jnp.asarray(batch["mos"]),
        )
    )
    params = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, jnp.float32), shapes
    )

    mesh = make_mesh(MeshConfig(data=1, fsdp=1, tensor=1))
    tcfg = TrainConfig(
        learning_rate=4e-5, output_dir="/tmp/aigv_trainbench", grad_checkpoint=True
    )
    trainer = Trainer(model, params, tcfg, total_steps=100, mesh=mesh)
    step = trainer.compiled_step()
    mb = microbatch(batch, 1)

    def run_n(n, key0):
        t0 = time.perf_counter()
        loss = None
        for i in range(n):
            trainer.state, loss = step(trainer.state, mb, jax.random.key(key0 + i))
        _ = float(loss)
        return time.perf_counter() - t0

    with mesh:
        trainer.state, loss = step(trainer.state, mb, jax.random.key(0))
        _ = float(loss)  # compile
        run_n(1, 100)  # warm queue fully
        # difference-of-two-runs: removes the fixed readback/dispatch cost
        t_short = run_n(args.iters, 200)
        t_long = run_n(2 * args.iters, 300)
    per_step = (t_long - t_short) / args.iters
    print(
        json.dumps(
            {
                "metric": f"stage{args.stage}_train_samples_per_sec_chip",
                "value": round(b / per_step, 3),
                "unit": "samples/sec/chip",
                "steps_per_sec": round(1.0 / per_step, 3),
                "batch": b,
                "seq": seq,
                "scale": args.scale,
            }
        )
    )


if __name__ == "__main__":
    main()

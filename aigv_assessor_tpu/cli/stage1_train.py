"""Stage-1 training entry point.

TPU-native equivalent of
`/root/reference/internvl/train/internvl/train/stage1_train.py` (launched by
`shell/train/stage1_train.sh`): train the spatiotemporal projection (mlp1 +
motion_mlp) on a frozen ViT + frozen LLM with the text CE loss, evaluating
periodically with quality-level accuracy and keeping the best checkpoint
(reference `CustomTrainer`, lines 217-337).
"""

from __future__ import annotations

import logging
import os
import sys

import jax

from aigv_assessor_tpu.cli.args import parse_args
from aigv_assessor_tpu.cli.common import build_model_and_tokenizer, mesh_from_args
from aigv_assessor_tpu.core.dist import init_dist
from aigv_assessor_tpu.data.dataset import build_datasets
from aigv_assessor_tpu.data.loader import DataLoader
from aigv_assessor_tpu.data.sampler import LengthGroupedSampler, ShardedBatchSampler
from aigv_assessor_tpu.train.checkpoint import CheckpointManager
from aigv_assessor_tpu.train.evaluate import evaluate_batches, save_and_evaluate
from aigv_assessor_tpu.train.trainer import (
    TrainConfig,
    Trainer,
    microbatch,
)

logger = logging.getLogger(__name__)

STAGE = 1
BEST_METRIC = "accuracy"  # stage-1 best-model criterion (stage1_train.py:286)
MOS_SCALE = 1.0


def main(argv=None, stage=STAGE, best_metric=BEST_METRIC, mos_scale=MOS_SCALE,
         on_best=None):
    logging.basicConfig(level=logging.INFO)
    init_dist()
    args = parse_args(f"AIGV-Assessor-TPU stage-{stage} training", argv)

    config, model, params, tokenizer = build_model_and_tokenizer(args, stage)
    mesh = mesh_from_args(args)
    n_dp = mesh.shape["data"] * mesh.shape["fsdp"]

    train_ds = build_datasets(
        args.meta_path,
        tokenizer,
        config,
        split="train",
        num_segments=args.num_segments,
        group_by_length=args.group_by_length,
        mos_scale=mos_scale,
        normalize_type=args.normalize_type,
        gif_fps=10.0 if stage == 1 else 1.0,
    )
    try:
        eval_ds = build_datasets(
            args.meta_path,
            tokenizer,
            config,
            split="test",
            num_segments=args.num_segments,
            group_by_length=args.group_by_length,
            mos_scale=mos_scale,
            normalize_type=args.normalize_type,
            gif_fps=10.0 if stage == 1 else 1.0,
        )
    except ValueError:
        eval_ds = None

    global_bs = args.per_device_train_batch_size * n_dp
    accum = args.gradient_accumulation_steps
    if len(train_ds) < global_bs * accum:
        logger.warning(
            "dataset (%d samples) smaller than one global batch (%d x %d "
            "accum): no training steps will run — shrink the mesh or batch",
            len(train_ds), global_bs, accum,
        )
    steps_per_epoch = max(len(train_ds) // (global_bs * accum), 1)
    total_steps = int(steps_per_epoch * args.num_train_epochs)

    tcfg = TrainConfig(
        output_dir=args.output_dir,
        learning_rate=args.learning_rate,
        weight_decay=args.weight_decay,
        warmup_ratio=args.warmup_ratio,
        lr_scheduler_type=args.lr_scheduler_type,
        num_train_epochs=args.num_train_epochs,
        per_device_train_batch_size=args.per_device_train_batch_size,
        gradient_accumulation_steps=accum,
        logging_steps=args.logging_steps,
        save_steps=args.save_steps,
        save_total_limit=args.save_total_limit,
        eval_steps=args.eval_steps if args.evaluation_strategy != "no" else 0,
        seed=args.seed,
        grad_checkpoint=args.grad_checkpoint,
        freeze_backbone=args.freeze_backbone,
        freeze_llm=args.freeze_llm,
        freeze_mlp=args.freeze_mlp,
        unfreeze_lm_head=args.unfreeze_lm_head,
        max_seq_length=args.max_seq_length,
        bf16=args.bf16,
        resume_from_checkpoint=args.resume_from_checkpoint,
        output_file=args.output_file,
        metrics_file=args.metrics_file,
    )

    def eval_fn(p, step):
        if eval_ds is None:
            return {}
        rows = run_eval(model, p, eval_ds, tokenizer, args, stage)
        return save_and_evaluate(
            rows,
            output_file=os.path.join(args.output_dir, args.output_file),
            metrics_file=os.path.join(args.output_dir, args.metrics_file),
            stage=stage,
        )

    ckpt = CheckpointManager(
        os.path.join(args.output_dir, "checkpoints"),
        save_total_limit=args.save_total_limit,
    )
    trainer = Trainer(
        model,
        params,
        tcfg,
        total_steps,
        mesh=mesh,
        eval_fn=eval_fn if eval_ds is not None else None,
        best_metric_key=best_metric,
        checkpoint_manager=ckpt,
        on_best=on_best(args) if callable(on_best) else None,
    )
    del params

    if args.resume_from_checkpoint:
        # mesh= so scalar leaves restore replicated over the mesh, not on
        # local device 0 (multi-process resume; see CheckpointManager.restore)
        trainer.state = CheckpointManager(
            args.resume_from_checkpoint
        ).restore(trainer.state, mesh=mesh)
        logger.info("resumed from %s", args.resume_from_checkpoint)

    def data_iter(epoch):
        if args.group_by_length and hasattr(train_ds, "raw_data"):
            # estimated lengths (the reference hardcodes 461/sample,
            # train_sampler_patch.py + stage1_train.py:437)
            est = [461] * len(train_ds)
            sampler = LengthGroupedSampler(
                est, args.per_device_train_batch_size, n_dp, seed=args.seed
            )
        else:
            sampler = None
        # per-host sharded loading: each host reads only its contiguous
        # shard of the global super-batch; shard_batch(process_local=...)
        # assembles the global arrays (SURVEY §2b TPU plan)
        bs = ShardedBatchSampler(
            sampler if sampler is not None else len(train_ds),
            global_batch_size=global_bs * accum,
            num_processes=jax.process_count(),
            process_index=jax.process_index(),
            seed=args.seed,
        )
        bs.set_epoch(epoch)
        loader = DataLoader(
            train_ds,
            bs,
            pad_to=args.max_seq_length if not args.group_by_length else None,
            num_workers=args.dataloader_num_workers,
        )
        for batch in loader:
            yield microbatch(batch.arrays(), accum)

    if args.do_train:
        trainer.train(data_iter, steps_per_epoch)
    else:
        trainer.maybe_eval(0)
    return trainer


def run_eval(model, params, eval_ds, tokenizer, args, stage):
    """Batched teacher-forced eval over the eval dataset."""
    bs = ShardedBatchSampler(
        len(eval_ds), global_batch_size=args.eval_batch_size, shuffle=False,
        drop_last=False,
    )
    loader = DataLoader(
        eval_ds, bs, pad_to=None, num_workers=args.dataloader_num_workers
    )
    return evaluate_batches(model, params, loader, tokenizer, stage=stage)


if __name__ == "__main__":
    main()
    sys.exit(0)

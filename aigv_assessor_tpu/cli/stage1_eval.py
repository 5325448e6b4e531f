"""Stage-1 evaluation entry point.

TPU-native equivalent of
`/root/reference/internvl/train/internvl/eval/stage1_eval.py` (launched by
`shell/eval/stage1_eval.sh`): teacher-forced forward over the eval
annotation (meta key 'annotation', `shell/data/my_eval.json`), argmax decode
at answer positions, quality word -> level, CSV + Accuracy/SRCC/PLCC/KRCC
metrics TXT (`stage1_eval.py:893-962`).

TPU difference: evaluation is batched (`--eval_batch_size`, default 8)
instead of the reference's bs=1 python loop — same numbers, higher
throughput (BASELINE.md config #3).
"""

from __future__ import annotations

import logging
import os
import sys

from aigv_assessor_tpu.cli.args import parse_args
from aigv_assessor_tpu.cli.common import build_model_and_tokenizer
from aigv_assessor_tpu.core.dist import init_dist
from aigv_assessor_tpu.data.dataset import build_datasets
from aigv_assessor_tpu.data.loader import DataLoader
from aigv_assessor_tpu.data.sampler import ShardedBatchSampler
from aigv_assessor_tpu.train.evaluate import evaluate_batches, save_and_evaluate

STAGE = 1
MOS_SCALE = 1.0


def main(argv=None, stage=STAGE, mos_scale=MOS_SCALE):
    logging.basicConfig(level=logging.INFO)
    init_dist()
    args = parse_args(f"AIGV-Assessor-TPU stage-{stage} evaluation", argv)
    config, model, params, tokenizer = build_model_and_tokenizer(args, stage)
    from aigv_assessor_tpu.models.loading import cast_params_for_inference

    params = cast_params_for_inference(params, model.precision)

    eval_ds = build_datasets(
        args.meta_path,
        tokenizer,
        config,
        split="eval",
        num_segments=args.num_segments,
        group_by_length=args.group_by_length,
        mos_scale=mos_scale,
        normalize_type=args.normalize_type,
        gif_fps=10.0 if stage == 1 else 1.0,
    )
    sampler = ShardedBatchSampler(
        len(eval_ds),
        global_batch_size=args.eval_batch_size,
        shuffle=False,
        drop_last=False,
    )
    loader = DataLoader(
        eval_ds, sampler, num_workers=args.dataloader_num_workers
    )
    rows = evaluate_batches(model, params, loader, tokenizer, stage=stage)
    os.makedirs(args.output_dir, exist_ok=True)
    metrics = save_and_evaluate(
        rows,
        output_file=os.path.join(args.output_dir, args.output_file),
        metrics_file=os.path.join(args.output_dir, args.metrics_file),
        stage=stage,
    )
    return metrics


if __name__ == "__main__":
    main()
    sys.exit(0)

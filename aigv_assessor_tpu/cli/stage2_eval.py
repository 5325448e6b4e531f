"""Stage-2 evaluation entry point.

TPU-native equivalent of
`/root/reference/internvl/train/internvl/eval/stage2_eval.py`: like stage-1
eval plus the continuous `score1` output per sample
(`stage2_eval.py:938`) and the second SRCC/PLCC/KRCC block over `pred_score`
(`stage2_eval.py:676-685`). CSV gains a `pred_score` column.
"""

from __future__ import annotations

import logging
import os
import sys

from aigv_assessor_tpu.cli import stage1_eval

logger = logging.getLogger(__name__)


def main(argv=None):
    # NOTE: the reference divides mos by 100 only in the stage-2 TRAINING
    # dataset (`stage2_train.py:613`); the standalone stage-2 eval keeps raw
    # mos (`stage2_eval.py:373,500` — no /100). Rank correlations are
    # unaffected either way, but the CSV 'mos' column must match.
    from aigv_assessor_tpu.cli.args import parse_args

    args = parse_args("AIGV-Assessor-TPU stage-2 evaluation", argv)
    if args.fused_meta_paths:
        return fused_main(args)
    return stage1_eval.main(argv, stage=2, mos_scale=1.0)


def fused_main(args):
    """Fused multi-perspective eval: every video decoded + frame-encoded
    ONCE for all perspectives (the reference runs one FULL eval per
    perspective, `shell/train/stage2_train.sh:13`). Emits per-perspective
    `results_p{i}.csv` (pred_score) + `metrics_p{i}.txt` (the stage-2
    score-correlation block)."""
    logging.basicConfig(level=logging.INFO)
    from aigv_assessor_tpu.cli.common import build_model_and_tokenizer
    from aigv_assessor_tpu.core.dist import init_dist
    from aigv_assessor_tpu.data.dataset import build_datasets
    from aigv_assessor_tpu.train.evaluate import (
        evaluate_perspectives,
        save_perspective_results,
    )

    init_dist()
    config, model, params, tokenizer = build_model_and_tokenizer(args, stage=2)
    from aigv_assessor_tpu.models.loading import cast_params_for_inference

    precision = model.precision
    if getattr(args, "eval_w8a8", False):
        # serving-grade precision for the protocol workload: quantize from
        # the fp32 originals first (same ordering as build_serving_stack),
        # then drop the fp32 masters
        from aigv_assessor_tpu.models.assessor import AIGVAssessor
        from aigv_assessor_tpu.models.loading import quantize_for_serving

        params, precision = quantize_for_serving(
            params, precision, w8a8=True
        )
        model = AIGVAssessor(config, precision)
    params = cast_params_for_inference(params, precision)
    metas = [args.meta_path] + list(args.fused_meta_paths)
    datasets = [
        build_datasets(
            m,
            tokenizer,
            config,
            split="eval",
            num_segments=args.num_segments,
            group_by_length=args.group_by_length,
            mos_scale=1.0,
            gif_fps=1.0,
            normalize_type=args.normalize_type,
        )
        for m in metas
    ]
    timing = {}
    rows = evaluate_perspectives(
        model, params, datasets,
        batch_size=args.eval_batch_size,
        workers=max(1, args.dataloader_num_workers),
        timing_out=timing,
    )
    n_videos = len(rows[0]) if rows else 0
    # print (not logger): jax/absl may own the root handler at WARNING
    # before basicConfig runs, and this line IS the e2e measurement output
    if timing:
        dt = timing["total_s"]
        msg = (
            "fused eval: %d videos x %d perspectives in %.2f s "
            "(%.2f videos/s, %.2f persp-evals/s incl. first-batch compile"
            % (n_videos, len(rows), dt, n_videos / dt,
               n_videos * len(rows) / dt)
        )
        if "steady_s" in timing and timing["steady_s"] > 0:
            sv, ss = timing["steady_videos"], timing["steady_s"]
            msg += "; steady-state %.2f videos/s, %.2f persp-evals/s" % (
                sv / ss, sv * len(rows) / ss
            )
        print(msg + ")", flush=True)
    os.makedirs(args.output_dir, exist_ok=True)
    all_metrics = {}
    for i, r in enumerate(rows):
        m = save_perspective_results(
            r,
            output_file=os.path.join(args.output_dir, f"results_p{i + 1}.csv"),
            metrics_file=os.path.join(args.output_dir, f"metrics_p{i + 1}.txt"),
        )
        logger.info("perspective %d (%s): %s", i + 1, metas[i], m)
        all_metrics[f"p{i + 1}"] = m
    return all_metrics


if __name__ == "__main__":
    main()
    sys.exit(0)

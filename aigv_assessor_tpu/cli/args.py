"""CLI argument surface.

Flag-for-flag compatible with the reference shell contract
(`/root/reference/shell/train/stage1_train.sh:26-63`,
`stage2_train.sh:26-67`, `shell/eval/stage{1,2}_eval.sh`) — the union of the
`ModelArguments` / `DataTrainingArguments` / HF `TrainingArguments` /
`CustomArguments` dataclasses the reference parses
(`stage1_train.py:73-215`). GPU-only flags (`--deepspeed`, `--report_to`)
are accepted and mapped to their TPU equivalents or ignored with a note.
TPU additions are grouped at the bottom (mesh axes, model scale).
"""

from __future__ import annotations

import argparse
from typing import List, Optional


def _bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "t", "yes", "y")


def build_parser(description: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=description)
    # ---- model ----
    p.add_argument("--model_name_or_path", type=str, default="")
    p.add_argument("--vision_path", type=str, default=None)
    p.add_argument("--llm_path", type=str, default=None)
    p.add_argument("--mlp_path", type=str, default=None)
    p.add_argument("--conv_style", type=str, default="internlm2-chat")
    p.add_argument("--force_image_size", type=int, default=448)
    p.add_argument("--down_sample_ratio", type=float, default=0.5)
    p.add_argument("--ps_version", type=str, default="v2")
    p.add_argument("--vision_select_layer", type=int, default=-1)
    p.add_argument("--drop_path_rate", type=float, default=0.1)
    p.add_argument("--use_backbone_lora", type=int, default=0)
    p.add_argument("--use_llm_lora", type=int, default=0)
    p.add_argument("--freeze_llm", type=_bool, default=True)
    p.add_argument("--freeze_backbone", type=_bool, default=True)
    p.add_argument("--freeze_mlp", type=_bool, default=False)
    p.add_argument("--unfreeze_lm_head", type=_bool, default=False)
    p.add_argument("--grad_checkpoint", type=_bool, default=True)
    p.add_argument(
        "--vit_remat_policy", type=str, default="",
        help="jax.checkpoint_policies name for the ViT's per-layer remat "
             "(e.g. dots_with_no_batch_dims_saveable); cuts the full "
             "encoder recompute that ViT-LoRA training otherwise pays",
    )
    # ---- data ----
    p.add_argument("--meta_path", type=str, required=True)
    p.add_argument(
        "--fused_meta_paths", type=str, nargs="*", default=None,
        help="stage-2 eval only: additional per-perspective meta JSONs over "
             "the SAME videos as --meta_path; all perspectives are scored "
             "in ONE pass per video (shared frame encode) instead of the "
             "reference's separate full runs (stage2_train.sh number=1..4)",
    )
    p.add_argument("--max_seq_length", type=int, default=4096)
    p.add_argument("--max_dynamic_patch", type=int, default=6)
    p.add_argument("--min_dynamic_patch", type=int, default=1)
    p.add_argument("--dynamic_image_size", type=_bool, default=True)
    p.add_argument("--use_thumbnail", type=_bool, default=True)
    p.add_argument("--pad2square", type=_bool, default=False)
    p.add_argument("--group_by_length", type=_bool, default=True)
    p.add_argument("--dataloader_num_workers", type=int, default=4)
    p.add_argument("--num_segments", type=int, default=8)
    p.add_argument("--normalize_type", type=str, default="imagenet")
    # ---- training ----
    p.add_argument("--output_dir", type=str, default="work_dirs/run")
    p.add_argument("--overwrite_output_dir", type=_bool, default=False)
    p.add_argument("--do_train", type=_bool, default=False)
    p.add_argument("--bf16", type=_bool, default=True)
    p.add_argument("--num_train_epochs", type=float, default=1.0)
    p.add_argument("--per_device_train_batch_size", type=int, default=4)
    p.add_argument("--gradient_accumulation_steps", type=int, default=1)
    p.add_argument("--learning_rate", type=float, default=4e-5)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--warmup_ratio", type=float, default=0.03)
    p.add_argument("--lr_scheduler_type", type=str, default="cosine")
    p.add_argument("--logging_steps", type=int, default=1)
    p.add_argument("--evaluation_strategy", type=str, default="no")
    p.add_argument("--eval_steps", type=int, default=0)
    p.add_argument("--save_strategy", type=str, default="steps")
    p.add_argument("--save_steps", type=int, default=60)
    p.add_argument("--save_total_limit", type=int, default=1)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--resume_from_checkpoint", type=str, default=None)
    # ---- eval artifacts (CustomArguments, stage1_train.py:73-86) ----
    p.add_argument("--output_file", type=str, default="results.csv")
    p.add_argument("--metrics_file", type=str, default="metrics.txt")
    # ---- accepted-for-compat (GPU-only in the reference) ----
    p.add_argument("--deepspeed", type=str, default=None,
                   help="ignored: ZeRO is subsumed by fsdp-axis sharding")
    p.add_argument("--report_to", type=str, default="none")
    # ---- TPU-native additions ----
    p.add_argument("--mesh_data", type=int, default=0,
                   help="data-parallel mesh axis size (0 = auto)")
    p.add_argument("--mesh_fsdp", type=int, default=1)
    p.add_argument("--mesh_tensor", type=int, default=1)
    p.add_argument("--model_scale", type=str, default="auto",
                   choices=["auto", "tiny", "2b", "8b"],
                   help="init scale when no checkpoint is given")
    p.add_argument("--eval_batch_size", type=int, default=8,
                   help="batched eval (the reference loops bs=1)")
    p.add_argument("--eval_w8a8", type=_bool, default=False,
                   help="run eval at the W8A8 serving precision (int8-MXU "
                        "matmuls in both towers, ops/w8a8.py) — the "
                        "precision the serving CLIs use; bounded score "
                        "drift vs bf16 (tests/test_w8a8.py)")
    return p


def parse_args(description: str, argv: Optional[List[str]] = None):
    return build_parser(description).parse_args(argv)

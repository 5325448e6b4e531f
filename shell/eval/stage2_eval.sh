#!/bin/bash
# Stage-2 evaluation launcher.
# TPU-native counterpart of /root/reference/shell/eval/stage2_eval.sh.
set -x

export PYTHONPATH="${PYTHONPATH}:$(cd "$(dirname "$0")/../.." && pwd)"
export TF_CPP_MIN_LOG_LEVEL=3

OUTPUT_DIR=${OUTPUT_DIR:-'work_dirs/aigv_tpu/mos3_stage2_eval'}
mkdir -p "$OUTPUT_DIR"

python -m aigv_assessor_tpu.cli.stage2_eval \
  --model_name_or_path "${MODEL_PATH:-work_dirs/aigv_tpu/mos3_stage2}" \
  --conv_style "internlm2-chat" \
  --output_dir ${OUTPUT_DIR} \
  --meta_path "${META_PATH:-shell/data/my_eval.json}" \
  --output_file "mos3_test_stage2.csv" \
  --metrics_file "metrics.txt" \
  --use_llm_lora 8 \
  --use_backbone_lora 8 \
  --force_image_size 448 \
  --down_sample_ratio 0.5 \
  --drop_path_rate 0.0 \
  --vision_select_layer -1 \
  --dataloader_num_workers 4 \
  --bf16 True \
  --max_seq_length 4096 \
  --group_by_length True \
  --ps_version 'v2' \
  --eval_batch_size ${EVAL_BATCH_SIZE:-8} \
  "$@" \
  2>&1 | tee -a "${OUTPUT_DIR}/eval_log.txt"

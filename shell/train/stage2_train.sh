#!/bin/bash
# Stage-2 training launcher (LoRA fine-tune + MOS regression).
# TPU-native counterpart of /root/reference/shell/train/stage2_train.sh.
set -x

CHIPS=${CHIPS:-1}
BATCH_SIZE=${BATCH_SIZE:-4}
PER_DEVICE_BATCH_SIZE=${PER_DEVICE_BATCH_SIZE:-4}
GRADIENT_ACC=$((BATCH_SIZE / PER_DEVICE_BATCH_SIZE / CHIPS))
[ "$GRADIENT_ACC" -lt 1 ] && GRADIENT_ACC=1

export PYTHONPATH="${PYTHONPATH}:$(cd "$(dirname "$0")/../.." && pwd)"
export TF_CPP_MIN_LOG_LEVEL=3

OUTPUT_DIR=${OUTPUT_DIR:-'work_dirs/aigv_tpu/mos3_stage2'}
mkdir -p "$OUTPUT_DIR"

python -m aigv_assessor_tpu.cli.stage2_train \
  --model_name_or_path "${MODEL_PATH:-}" \
  --conv_style "internlm2-chat" \
  --output_dir ${OUTPUT_DIR} \
  --meta_path "${META_PATH:-shell/data/my.json}" \
  --output_file "T2VQA_MOS3_st2_lora2.csv" \
  --metrics_file "T2VQA_MOS3_st2_lora2.txt" \
  --use_llm_lora 8 \
  --use_backbone_lora 8 \
  --overwrite_output_dir True \
  --force_image_size 448 \
  --max_dynamic_patch 6 \
  --down_sample_ratio 0.5 \
  --drop_path_rate 0.1 \
  --freeze_llm True \
  --freeze_mlp True \
  --freeze_backbone True \
  --vision_select_layer -1 \
  --dataloader_num_workers 4 \
  --bf16 True \
  --num_train_epochs 50 \
  --per_device_train_batch_size ${PER_DEVICE_BATCH_SIZE} \
  --gradient_accumulation_steps ${GRADIENT_ACC} \
  --evaluation_strategy "steps" \
  --save_strategy "steps" \
  --save_steps 500000 \
  --eval_steps 250 \
  --save_total_limit 1 \
  --learning_rate 4e-5 \
  --weight_decay 0.01 \
  --warmup_ratio 0.03 \
  --lr_scheduler_type "cosine" \
  --logging_steps 1 \
  --max_seq_length 4096 \
  --do_train True \
  --grad_checkpoint True \
  --group_by_length True \
  --dynamic_image_size True \
  --use_thumbnail True \
  --ps_version 'v2' \
  --mesh_fsdp ${MESH_FSDP:-1} \
  "$@" \
  2>&1 | tee -a "${OUTPUT_DIR}/training_log.txt"

#!/bin/bash
# Stage-1 training launcher.
#
# TPU-native counterpart of the reference launcher
# (/root/reference/shell/train/stage1_train.sh): same env contract
# (BATCH_SIZE / PER_DEVICE_BATCH_SIZE, GRADIENT_ACC derived) and the same
# entry flags, but a single JAX process drives all local TPU chips (no
# torchrun; multi-host runs set JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
# JAX_PROCESS_ID per host).
set -x

CHIPS=${CHIPS:-1}
BATCH_SIZE=${BATCH_SIZE:-4}
PER_DEVICE_BATCH_SIZE=${PER_DEVICE_BATCH_SIZE:-4}
GRADIENT_ACC=$((BATCH_SIZE / PER_DEVICE_BATCH_SIZE / CHIPS))
[ "$GRADIENT_ACC" -lt 1 ] && GRADIENT_ACC=1

export PYTHONPATH="${PYTHONPATH}:$(cd "$(dirname "$0")/../.." && pwd)"
export TF_CPP_MIN_LOG_LEVEL=3

OUTPUT_DIR=${OUTPUT_DIR:-'work_dirs/aigv_tpu/mos1_stage1'}
mkdir -p "$OUTPUT_DIR"

python -m aigv_assessor_tpu.cli.stage1_train \
  --model_name_or_path "${MODEL_PATH:-InternVL2-8B}" \
  --conv_style "internlm2-chat" \
  --output_dir ${OUTPUT_DIR} \
  --meta_path "${META_PATH:-shell/data/my.json}" \
  --overwrite_output_dir True \
  --force_image_size 448 \
  --max_dynamic_patch 6 \
  --down_sample_ratio 0.5 \
  --drop_path_rate 0.1 \
  --freeze_llm True \
  --freeze_mlp False \
  --freeze_backbone True \
  --vision_select_layer -1 \
  --dataloader_num_workers 4 \
  --bf16 True \
  --num_train_epochs 50 \
  --per_device_train_batch_size ${PER_DEVICE_BATCH_SIZE} \
  --gradient_accumulation_steps ${GRADIENT_ACC} \
  --evaluation_strategy "no" \
  --save_strategy "steps" \
  --save_steps 60 \
  --eval_steps 2 \
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
  "$@" \
  2>&1 | tee -a "${OUTPUT_DIR}/training_log.txt"

#!/bin/bash
# Phase II vision-only transfer, COCO multi-label object cls: 5%/10% subsets.
DATA_DIR=${CLIMB_DATA_DIR:-/data/datasets/MCL/}
OUT_DIR=${CLIMB_OUTPUT_DIR:-/data/experiments/MCL/}
CKPTS=${CKPT_LIST:-"dandelin/vilt-b32-mlm"}

for s in 10; do
  for n in 0.05 0.1; do
    for c in $CKPTS; do
      echo "ckpt: $c, percentage: $n, sample_seed: $s"
      python -m climb_tpu.cli.train_vision --encoder_name vilt \
          --checkpoint_name "$c" \
          --task_name coco-cls \
          --climb_data_dir $DATA_DIR \
          --output_dir $OUT_DIR/vision_only \
          --batch_size 32 \
          --model_catog vilt-v-cls \
          --num_shot $n \
          --subsample_seed $s "$@"
    done
  done
done

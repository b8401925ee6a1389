#!/bin/bash
# Phase II language-only transfer, multiple choice (PIQA, HellaSwag, CSQA):
# 1024/4096 examples x seeds {10,50,100}.
DATA_DIR=${CLIMB_DATA_DIR:-/data/datasets/MCL/}
OUT_DIR=${CLIMB_OUTPUT_DIR:-/data/experiments/MCL/}
CKPTS=${CKPT_LIST:-"dandelin/vilt-b32-mlm"}

for t in piqa hellaswag commonsenseqa; do
  for s in 10 50 100; do
    for n in 1024 4096; do
      for c in $CKPTS; do
        echo "ckpt: $c, n-shot: $n, sample_seed: $s"
        python -m climb_tpu.cli.train_language --encoder_name viltbert \
            --checkpoint_name "$c" \
            --task_name $t \
            --climb_data_dir $DATA_DIR \
            --output_dir $OUT_DIR/lang_only/viltbert \
            --batch_size 16 \
            --model_catog viltbert-l-mc \
            --num_shot $n \
            --subsample_seed $s "$@"
      done
    done
  done
done

#!/bin/bash
# Phase II language-only transfer, sequence classification (SST-2, IMDb):
# 16/32-shot per class x seeds {10,50,100} over upstream encoder checkpoints.
# (parity: reference exp_scripts/lang/vilt-seq.sh)
DATA_DIR=${CLIMB_DATA_DIR:-/data/datasets/MCL/}
OUT_DIR=${CLIMB_OUTPUT_DIR:-/data/experiments/MCL/}
CKPTS=${CKPT_LIST:-"dandelin/vilt-b32-mlm"}

for t in sst2 imdb; do
  for s in 10 50 100; do
    for n in 16 32; do
      for c in $CKPTS; do
        echo "ckpt: $c, n-shot: $n, sample_seed: $s"
        python -m climb_tpu.cli.train_language --encoder_name vilt \
            --checkpoint_name "$c" \
            --task_name $t \
            --climb_data_dir $DATA_DIR \
            --output_dir $OUT_DIR/lang_only \
            --batch_size 16 \
            --model_catog vilt-l-seq \
            --num_shot $n \
            --subsample_seed $s "$@"
      done
    done
  done
done

#!/bin/bash
# Phase II low-shot multimodal transfer over the sequential_ft checkpoints.
DATA_DIR=${CLIMB_DATA_DIR:-/data/datasets/MCL/}
OUT_DIR=${CLIMB_OUTPUT_DIR:-/data/experiments/MCL/}
python -m climb_tpu.cli.train_lowshot_multimodal --encoder_name vilt \
    --pretrained_model_name dandelin/vilt-b32-mlm \
    --ordered_cl_tasks vqa,nlvr2,snli-ve,vcr \
    --cl_algorithm sequential_ft \
    --climb_data_dir $DATA_DIR \
    --output_dir $OUT_DIR \
    --compute_dtype bfloat16 --remat --remat_policy selective \
    --grad_accum_steps auto --scan_unroll 12 \
    --batch_size 64 "$@"

#!/bin/bash
# Single-task fine-tuning baseline on nlvr2 (provides the relative-gain reference).
DATA_DIR=${CLIMB_DATA_DIR:-/data/datasets/MCL/}
OUT_DIR=${CLIMB_OUTPUT_DIR:-/data/experiments/MCL/}
python -m climb_tpu.cli.train_upstream_continual_learning --encoder_name vilt \
    --pretrained_model_name dandelin/vilt-b32-mlm \
    --ordered_cl_tasks nlvr2 \
    --cl_algorithm singletask_ft \
    --climb_data_dir $DATA_DIR \
    --do_train \
    --output_dir $OUT_DIR \
    --compute_dtype bfloat16 --remat \
    --batch_size 64 "$@"

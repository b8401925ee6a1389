#!/bin/bash
# Upstream CL with experience replay (memory 1%, replay every 100 steps).
DATA_DIR=${CLIMB_DATA_DIR:-/data/datasets/MCL/}
OUT_DIR=${CLIMB_OUTPUT_DIR:-/data/experiments/MCL/}
python -m climb_tpu.cli.train_upstream_continual_learning --encoder_name vilt \
    --pretrained_model_name dandelin/vilt-b32-mlm \
    --ordered_cl_tasks vqa,nlvr2,snli-ve,vcr \
    --cl_algorithm experience_replay \
    --memory_percentage 0.01 \
    --memory_sampling_strategy random \
    --replay_frequency 100 \
    --climb_data_dir $DATA_DIR \
    --do_train --do_eval \
    --output_dir $OUT_DIR \
    --do_wandb_logging \
    --compute_dtype bfloat16 --remat --remat_policy selective \
    --grad_accum_steps auto --scan_unroll 12 \
    --batch_size 64 "$@"

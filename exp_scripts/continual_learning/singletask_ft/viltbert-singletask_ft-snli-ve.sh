#!/bin/bash
# Single-task fine-tuning baseline on snli-ve with ViLT-BERT.
# (parity: reference exp_scripts/continual_learning/singletask_ft/viltbert-snli_ve.sh)
DATA_DIR=${CLIMB_DATA_DIR:-/data/datasets/MCL/}
OUT_DIR=${CLIMB_OUTPUT_DIR:-/data/experiments/MCL/}
python -m climb_tpu.cli.train_upstream_continual_learning --encoder_name viltbert \
    --pretrained_model_name dandelin/vilt-b32-mlm \
    --ordered_cl_tasks snli-ve \
    --cl_algorithm singletask_ft \
    --climb_data_dir $DATA_DIR \
    --do_train \
    --output_dir $OUT_DIR \
    --do_wandb_logging \
    --compute_dtype bfloat16 --remat --remat_policy selective \
    --grad_accum_steps auto --scan_unroll 12 \
    --batch_size 64 "$@"

#!/bin/bash
# Phase II low-shot transfer over the freeze_bottom_k_layers upstream checkpoints.
# (parity: reference exp_scripts/lowshot_multimodal/vqa_nlvr_snlive_vcr/vilt-freeze_bottom9layers.sh)
DATA_DIR=${CLIMB_DATA_DIR:-/data/datasets/MCL/}
OUT_DIR=${CLIMB_OUTPUT_DIR:-/data/experiments/MCL/}
python -m climb_tpu.cli.train_lowshot_multimodal --encoder_name vilt \
    --pretrained_model_name dandelin/vilt-b32-mlm \
    --ordered_cl_tasks vqa,nlvr2,snli-ve,vcr \
    --cl_algorithm freeze_bottom_k_layers \
    --layers_to_freeze 9 \
    --climb_data_dir $DATA_DIR \
    --output_dir $OUT_DIR \
    --compute_dtype bfloat16 --remat --remat_policy selective \
    --grad_accum_steps auto --scan_unroll 12 \
    --batch_size 64 "$@"

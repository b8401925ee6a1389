#!/bin/bash
# Upstream CL with feature distillation (beyond-reference algorithm:
# climb_tpu/cl/distill.py — anchors encoder features on the end-of-previous-
# task teacher; no reference counterpart).
DATA_DIR=${CLIMB_DATA_DIR:-/data/datasets/MCL/}
OUT_DIR=${CLIMB_OUTPUT_DIR:-/data/experiments/MCL/}
python -m climb_tpu.cli.train_upstream_continual_learning --encoder_name vilt \
    --pretrained_model_name dandelin/vilt-b32-mlm \
    --ordered_cl_tasks vqa,nlvr2,snli-ve,vcr \
    --cl_algorithm feature_distill \
    --distill_loss_weight 1.0 \
    --climb_data_dir $DATA_DIR \
    --do_train --do_eval \
    --output_dir $OUT_DIR \
    --do_wandb_logging \
    --compute_dtype bfloat16 --remat --remat_policy selective \
    --grad_accum_steps auto --scan_unroll 12 \
    --batch_size 64 "$@"

#!/bin/bash
# Upstream CL: SNLI-VE -> VCR -> VQAv2 -> NLVR2, sequential fine-tuning.
# (parity: reference exp_scripts/continual_learning/snlive_vcr_vqa_nlvr/vilt-sequential_ft.sh)
DATA_DIR=${CLIMB_DATA_DIR:-/data/datasets/MCL/}
OUT_DIR=${CLIMB_OUTPUT_DIR:-/data/experiments/MCL/}
python -m climb_tpu.cli.train_upstream_continual_learning --encoder_name vilt \
    --pretrained_model_name dandelin/vilt-b32-mlm \
    --ordered_cl_tasks snli-ve,vcr,vqa,nlvr2 \
    --cl_algorithm sequential_ft \
    --climb_data_dir $DATA_DIR \
    --do_train --do_eval \
    --output_dir $OUT_DIR \
    --do_wandb_logging \
    --compute_dtype bfloat16 --remat --remat_policy selective \
    --grad_accum_steps auto --scan_unroll 12 \
    --batch_size 64 "$@"

#!/bin/bash
# Flatten NLVR2 train image shards into images/train/
# (parity: reference src/data/preproc_nlvr2_images.sh)
NLVR2_DIR=${1:?usage: preproc_nlvr2_images.sh <nlvr2_dir>}
mkdir -p "$NLVR2_DIR/images/train"
for shard in "$NLVR2_DIR"/images/train_img/*/; do
  [ -d "$shard" ] && mv "$shard"*.png "$NLVR2_DIR/images/train/" 2>/dev/null
done
echo "NLVR2 train images flattened into $NLVR2_DIR/images/train"

#!/bin/bash
# Fetch PIQA / HellaSwag / CommonsenseQA jsonl files
# (parity: reference src/data/download_lang_mc.sh)
DATA_DIR=${1:?usage: download_lang_mc.sh <data_dir>}
mkdir -p "$DATA_DIR"/{piqa,hellaswag,commonsenseqa}
cd "$DATA_DIR/piqa"
wget -nc https://yonatanbisk.com/piqa/data/train.jsonl
wget -nc https://yonatanbisk.com/piqa/data/train-labels.lst
wget -nc https://yonatanbisk.com/piqa/data/valid.jsonl
wget -nc https://yonatanbisk.com/piqa/data/valid-labels.lst
cd "$DATA_DIR/hellaswag"
wget -nc https://raw.githubusercontent.com/rowanz/hellaswag/master/data/hellaswag_train.jsonl
wget -nc https://raw.githubusercontent.com/rowanz/hellaswag/master/data/hellaswag_val.jsonl
cd "$DATA_DIR/commonsenseqa"
wget -nc https://s3.amazonaws.com/commensenseqa/train_rand_split.jsonl
wget -nc https://s3.amazonaws.com/commensenseqa/dev_rand_split.jsonl

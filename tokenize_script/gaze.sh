#!/bin/bash
# Batch eye-gaze tokenization (reference: tokenize_script/gaze.sh).
set -euo pipefail
CKPT=${CKPT:-ckpt/checkpoint-gaze.pth}
DATA=${1:?usage: gaze.sh <dataset_dir_or_npy> [out_dir]}
OUT=${2:-tokens/gaze/$(basename "$DATA")}
python run_training_vqvae.py \
    --config cfgs/vqvae/gaze.yaml \
    --resume "$CKPT" \
    --tokenize --tokenize_path "$DATA" \
    --tokenize_save_path "$OUT" --no_log_wandb

#!/bin/bash
# Batch cam-trajectory tokenization (reference: tokenize_script/cam.sh).
# On TPU there is no torchrun: one process drives the chip; run one copy per
# dataset directory (the cam/gaze tokenizers are tiny and host-bound).
set -euo pipefail
CKPT=${CKPT:-ckpt/checkpoint-cam.pth}
DATA=${1:?usage: cam.sh <dataset_dir_or_npy> [out_dir]}
OUT=${2:-tokens/cam/$(basename "$DATA")}
python run_training_vqvae.py \
    --config cfgs/vqvae/cam.yaml \
    --resume "$CKPT" \
    --tokenize --tokenize_path "$DATA" \
    --tokenize_save_path "$OUT" --no_log_wandb

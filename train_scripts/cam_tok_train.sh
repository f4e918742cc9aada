#!/bin/bash
# Cam tokenizer training (reference: train_slurm_script/cam_tok_train.slurm).
set -euo pipefail
python run_training_vqvae.py --config cfgs/vqvae/cam.yaml \
    --data_path "${1:?usage: cam_tok_train.sh <clips.npy> [extra flags]}" "${@:2}"

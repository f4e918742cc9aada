#!/bin/bash
# Gaze tokenizer training (reference: train_slurm_script/gaze_train.slurm).
set -euo pipefail
python run_training_vqvae.py --config cfgs/vqvae/gaze.yaml \
    --data_path "${1:?usage: gaze_train.sh <clips.npy> [extra flags]}" "${@:2}"

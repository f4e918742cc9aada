#!/bin/bash
# Multi-host pretraining launcher — the TPU-pod equivalent of the reference's
# slurm script (reference: train_slurm_script/clariden_main_500b_2048.slurm):
# where slurm+torchrun rendezvous 64 nodes x 4 GPUs over c10d/NCCL, a TPU pod
# runs THE SAME single-program command on every host and jax.distributed
# auto-discovers the mesh from the TPU metadata (core/distributed.py).
#
# Usage (from a machine with gcloud configured):
#   TPU_NAME=my-v5e-256 ZONE=us-west4-a ./train_scripts/launch_tpu_pod.sh \
#       cfgs/egom2p/main_mod4.yaml
#
# Or run directly on each pod worker (GKE/xpk style):
#   python run_training_egom2p.py --config cfgs/egom2p/main_mod4.yaml
set -euo pipefail
CONFIG=${1:-cfgs/egom2p/main_mod4.yaml}
TPU_NAME=${TPU_NAME:?set TPU_NAME}
ZONE=${ZONE:?set ZONE}
# multi-host checkpoints need a SHARED dir (GCS/NFS); default to the
# config's output_dir, override with OUTPUT_DIR=gs://...
OUT_FLAG=${OUTPUT_DIR:+--output_dir $OUTPUT_DIR}

CMD="cd ~/egom2p_tpu && \
  LIBTPU_INIT_ARGS='--xla_tpu_enable_async_collective_fusion=true' \
  python run_training_egom2p.py --config $CONFIG $OUT_FLAG"

# one identical process per host; jax.distributed.initialize() inside the
# trainer picks up coordinator/rank from the TPU runtime
gcloud compute tpus tpu-vm ssh "$TPU_NAME" --zone "$ZONE" \
    --worker=all --command "$CMD"

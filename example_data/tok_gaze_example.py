#!/usr/bin/env python
"""Gaze tokenizer round-trip example.

Equivalent of the reference example (reference: example_data/tok_gaze_example.py):
tokenize `gaze.npy` (60x2 gaze points) to 30 tokens, reconstruct, and report
the masked MSE against the converted input.
"""
import argparse
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from egom2p_tpu.data.cam_gaze import convert_gaze  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="ckpt/checkpoint-gaze.pth")
    p.add_argument("--gaze", default="/root/reference/example_data/gaze.npy")
    p.add_argument("--out", default="example_data")
    p.add_argument("--random-init", action="store_true",
                   help="smoke mode: run with random weights, no checkpoint")
    args = p.parse_args()

    resume = [] if args.random_init else ["--resume", args.ckpt]
    base = [sys.executable, os.path.join(REPO, "run_training_vqvae.py"),
            "--domain", "gaze", *resume, "--tokenize",
            "--tokenize_path", args.gaze, "--tokenize_save_path", args.out,
            "--no_log_wandb"]
    subprocess.run(base, check=True)
    subprocess.run(base + ["--recon"], check=True)

    conv = convert_gaze(np.load(args.gaze), orig_res=[896, 504],
                        resize_res=[896, 504], new_res=[480, 480])
    gt = conv[:, :2] * 0.5 + 0.5  # back to [0, 1]
    valid = conv[:, 2] > 0
    pred = np.load(os.path.join(args.out, "token", "gaze-recon.npy"))
    print()
    print("#######################################")
    print("MSE for gaze_recon and gaze_input:")
    print("MSE:", ((gt[valid] - pred[valid]) ** 2).mean())

#!/usr/bin/env python
"""Camera tokenizer round-trip example.

Equivalent of the reference example (reference: example_data/tok_cam_example.py):
tokenize `cam.npy` (60x4x4 opencv poses) to 30 tokens, reconstruct, and report
ATE / RTE / RRE against the canonicalized input.  With the released
`checkpoint-cam.pth` the expected output is approximately
{'ATE': 0.00587, 'RTE': 0.00284, 'RRE_deg': 0.298}.

Usage:
    python example_data/tok_cam_example.py --ckpt ckpt/checkpoint-cam.pth \
        [--cam /root/reference/example_data/cam.npy]

`--random-init` runs the same tokenize -> reconstruct pipeline with random
weights (self-consistency smoke mode: no checkpoint required, metrics are
meaningless but the full path executes; see tests/test_golden_checkpoints.py).
"""
import argparse
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from egom2p_tpu.data.cam_gaze import canonicalize_cam, evaluate_9d_trajectory  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="ckpt/checkpoint-cam.pth")
    p.add_argument("--cam", default="/root/reference/example_data/cam.npy")
    p.add_argument("--out", default="example_data")
    p.add_argument("--random-init", action="store_true",
                   help="smoke mode: run with random weights, no checkpoint")
    args = p.parse_args()

    resume = [] if args.random_init else ["--resume", args.ckpt]
    base = [sys.executable, os.path.join(REPO, "run_training_vqvae.py"),
            "--domain", "cam", *resume, "--tokenize",
            "--tokenize_path", args.cam, "--tokenize_save_path", args.out,
            "--no_log_wandb"]
    subprocess.run(base, check=True)
    subprocess.run(base + ["--recon"], check=True)

    cano_input = canonicalize_cam(np.load(args.cam))
    recon = np.load(os.path.join(args.out, "token", "cam-recon.npy"))
    print()
    print("###########################################")
    print("reconstructed vs input camera trajectory:")
    # expected with the released checkpoint:
    # {'ATE': 0.00587, 'RTE': 0.00284, 'RRE_deg': 0.298}
    print(evaluate_9d_trajectory(recon, cano_input, delta=1))

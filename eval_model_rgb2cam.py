#!/usr/bin/env python
"""EgoM2P-TPU rgb2cam evaluation.

TPU-native equivalent of the reference eval script
(reference: eval_model_rgb2cam.py): tok_rgb conditioning -> tok_cam
generation with ROAR (3 steps, temp 0.01, cfg 2.0, top-p 0.8),
decoded to artifacts under --out.

Run with --smoke for a random-weights end-to-end pipeline check.
"""
from egom2p_tpu.cli.eval_common import build_argparser, run_task

if __name__ == "__main__":
    args = build_argparser("rgb2cam").parse_args()
    run_task("rgb2cam", "tok_rgb", "tok_cam", 3, args)

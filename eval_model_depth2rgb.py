#!/usr/bin/env python
"""EgoM2P-TPU depth2rgb evaluation.

TPU-native equivalent of the reference eval script
(reference: eval_model_depth2rgb.py): tok_depth conditioning -> tok_rgb
generation with ROAR (6 steps, temp 0.01, cfg 2.0, top-p 0.8),
decoded to artifacts under --out.

Run with --smoke for a random-weights end-to-end pipeline check.
"""
from egom2p_tpu.cli.eval_common import build_argparser, run_task

if __name__ == "__main__":
    args = build_argparser("depth2rgb").parse_args()
    run_task("depth2rgb", "tok_depth", "tok_rgb", 6, args)

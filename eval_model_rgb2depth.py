#!/usr/bin/env python
"""EgoM2P-TPU rgb2depth evaluation.

TPU-native equivalent of the reference eval script
(reference: eval_model_rgb2depth.py): tok_rgb conditioning -> tok_depth
generation with ROAR (3 steps, temp 0.01, cfg 2.0, top-p 0.8),
decoded to artifacts under --out.

Run with --smoke for a random-weights end-to-end pipeline check.
"""
from egom2p_tpu.cli.eval_common import build_argparser, run_task

if __name__ == "__main__":
    args = build_argparser("rgb2depth").parse_args()
    run_task("rgb2depth", "tok_rgb", "tok_depth", 3, args)

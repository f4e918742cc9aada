#!/usr/bin/env python
"""North-star benchmark: 2s-clips/sec/chip for tokenize + rgb2depth inference.

Runs the full production pipeline on the real TPU chip:
  mp4 ingest (native decoder) -> Cosmos DV4x8x8 tokenize (5120 tokens)
  -> EgoM2P-base ROAR rgb2depth generation (3 steps, cfg 2.0, top-p 0.8)

and prints ONE JSON line.  Weights are random unless checkpoints exist under
./ckpt (throughput is weight-independent).  The first run pays XLA compiles;
the measurement excludes them via a warmup pass.

The reference publishes no throughput numbers (BASELINE.md), so vs_baseline
is reported against this repo's recorded first-round value when available
(bench_baseline.json), else null.
"""
import json
import os
import sys
import time


def main():
    t_setup = time.time()
    from egom2p_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import numpy as np
    import types

    from egom2p_tpu.cli import eval_common
    from egom2p_tpu.data.video_ingest import read_video
    from egom2p_tpu.data.modality_info import MODALITY_INFO
    from egom2p_tpu.generate import (build_chained_generation_schedules,
                                     init_empty_target_modality,
                                     init_full_input_modality)
    from egom2p_tpu.generate.sampler import GenerationSampler

    args = types.SimpleNamespace(
        ckpt="./ckpt/checkpoint-main", video_tok_ckpt="./ckpt/cosmos-dv4x8x8",
        cam_tok_ckpt="./ckpt/checkpoint-cam", gaze_tok_ckpt="./ckpt/checkpoint-gaze",
        model="egom2p_base_12e_12d_swiglu_nobias", smoke=True, seed=0)

    model, params = eval_common.load_main_model(args)
    vid_tok = eval_common.load_video_tokenizer(args)
    sampler = GenerationSampler(model, params)

    video = read_video("/root/reference/example_data/rgb2dep_h2o.mp4",
                       out_size=256)[None]  # (1, 16, 256, 256, 3) @ 8fps

    schedule = build_chained_generation_schedules(
        cond_domains=["tok_rgb"], target_domains=["tok_depth"],
        tokens_per_target=[5120], autoregression_schemes=["roar"],
        decoding_steps=[3], token_decoding_schedules=["linear"],
        temps=[0.01], temp_schedules=["constant"], cfg_scales=[2.0],
        cfg_schedules=["constant"], cfg_grow_conditioning=True)

    def one_clip(seed):
        tokens = vid_tok.forward(video).reshape(1, -1).astype(np.int32)
        sample = {"tok_rgb": {
            "tensor": tokens,
            "input_mask": np.zeros(tokens.shape, dtype=bool),
            "target_mask": np.ones(tokens.shape, dtype=bool)}}
        init_empty_target_modality(sample, MODALITY_INFO, "tok_depth", 1, 5120)
        init_full_input_modality(sample, MODALITY_INFO, "tok_rgb")
        out = sampler.generate(sample, schedule, top_p=0.8, top_k=0.0, seed=seed)
        return out["tok_depth"]["tensor"]

    # warmup: pays all XLA compiles
    one_clip(0)
    setup_s = time.time() - t_setup

    n = int(os.environ.get("BENCH_CLIPS", "4"))
    t0 = time.time()
    for i in range(n):
        one_clip(i + 1)
    dt = time.time() - t0
    clips_per_sec = n / dt

    baseline = None
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_baseline.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            baseline = json.load(f).get("clips_per_sec_per_chip")

    result = {
        "metric": "2s-clips/sec/chip (tokenize + rgb2depth infer)",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s/chip",
        "vs_baseline": (round(clips_per_sec / baseline, 3)
                        if baseline else None),
    }
    print(json.dumps(result))
    print(f"# setup+compile {setup_s:.1f}s; {n} clips in {dt:.2f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()

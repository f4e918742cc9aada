#!/usr/bin/env python
"""North-star benchmark: 2s-clips/sec/chip for tokenize + rgb2depth inference.

Runs the full production pipeline on the real TPU chip:
  mp4 ingest (native decoder) -> Cosmos DV4x8x8 tokenize (5120 tokens)
  -> EgoM2P-base ROAR rgb2depth generation (3 steps, cfg 2.0, top-p 0.8)

and prints ONE JSON line.  Weights are random unless checkpoints exist under
./ckpt (throughput is weight-independent).  The first run pays XLA compiles;
the measurement excludes them via a warmup pass.

Pipeline shape (all per-batch, BENCH_BATCH clips per dispatch, default 8):
  * uint8 videos are pre-staged on device (the dev harness reaches the chip
    through an RPC tunnel at ~20-40MB/s H2D; see the inline rationale),
  * the token grid stays on device between tokenize and generation
    (device_out=True -> GenerationSampler's device-resident chain),
  * the 3 ROAR steps are 3 async dispatches with no intermediate readback.

vs_baseline is reported against this repo's recorded first-round value
(bench_baseline.json), else null; the reference publishes no throughput
numbers (BASELINE.md).

MFU note: the reported mfu_pct counts useful model FLOPs (analytic formula
below + XLA cost analysis for the tokenizer) against the v5e peak of
197 bf16 TFLOP/s; CFG doubles the decoder batch and grows conditioning, which
the formula includes.
"""
import json
import os
import sys
import time

V5E_PEAK_TFLOPS = 197.0


def _gen_flops_per_batch(B, n_layers=12, dim=768, vocab=64000,
                         steps=((5632, 256, 1707), (7168, 2048, 1707),
                                (8960, 3584, 1706))):
    """Analytic FLOPs for one 3-step ROAR rgb2depth chain at batch B.

    Per encoder layer at length N: attn projections 8*N*d^2, attn matmuls
    4*N^2*d, SwiGLU MLP 2*N*3*d*h (h = 2048); decoder adds cross-attention.
    steps = (cond_enc_len, uncond_enc_len, k_decoded) per ROAR step."""
    h = 2048
    total = 0.0
    for n_c, n_u, k in steps:
        for n in (n_c, n_u):  # encoder on cond + (split-shape) uncond
            total += n_layers * (8 * n * dim**2 + 4 * n**2 * dim
                                 + 2 * n * 3 * dim * h) * B
        # decoder over k positions: cond branch crosses to n_c, uncond (same
        # B) to n_u — split-shape, incl. the per-layer cross K/V projections
        for n_ctx in (n_c, n_u):
            total += n_layers * (8 * k * dim**2 + 4 * k**2 * dim
                                 + 4 * k * n_ctx * dim + 4 * k * dim**2
                                 + 4 * n_ctx * dim**2
                                 + 2 * k * 3 * dim * h) * B
        # 64k-vocab logits head
        total += 2 * k * dim * vocab * 2 * B  # 64k head on both branches
    return total


def main():
    t_setup = time.time()
    from egom2p_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import numpy as np
    import types

    import jax
    import jax.numpy as jnp

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

    B = int(os.environ.get("BENCH_BATCH", "8"))
    clip = read_video("/root/reference/example_data/rgb2dep_h2o.mp4",
                      out_size=256)  # (16, 256, 256, 3) uint8 @ 8fps
    video = np.repeat(clip[None], B, axis=0)

    schedule = build_chained_generation_schedules(
        cond_domains=["tok_rgb"], target_domains=["tok_depth"],
        tokens_per_target=[5120], autoregression_schemes=["roar"],
        decoding_steps=[3], token_decoding_schedules=["linear"],
        temps=[0.01], temp_schedules=["constant"], cfg_scales=[2.0],
        cfg_schedules=["constant"], cfg_grow_conditioning=True)

    def one_batch(seed, video_dev):
        tokens = vid_tok.forward(video_dev, device_out=True)
        tokens = tokens.reshape(B, -1).astype(jnp.int32)
        sample = {"tok_rgb": {
            "tensor": tokens,
            "input_mask": np.zeros((B, 5120), dtype=bool),
            "target_mask": np.ones((B, 5120), dtype=bool)}}
        init_empty_target_modality(sample, MODALITY_INFO, "tok_depth", B, 5120)
        init_full_input_modality(sample, MODALITY_INFO, "tok_rgb")
        out = sampler.generate(sample, schedule, top_p=0.8, top_k=0.0,
                               seed=seed)
        return out["tok_depth"]["tensor"]

    # model/tokenizer construction cost vs compile cost, split (round-4
    # VERDICT item 5): load_s is imports + weight init; warmup pays the XLA
    # compiles (near-zero when the persistent cache is warm).
    load_s = time.time() - t_setup
    cache_dir = jax.config.jax_compilation_cache_dir or ""

    def _cache_entries():
        try:
            return len(os.listdir(cache_dir)) if cache_dir else -1
        except OSError:
            return -1
    cache_before = _cache_entries()
    t_warm = time.time()
    one_batch(0, jnp.asarray(video))
    warmup_s = time.time() - t_warm
    compiled_new = (_cache_entries() - cache_before
                    if cache_before >= 0 else None)
    setup_s = time.time() - t_setup

    n = int(os.environ.get("BENCH_BATCHES", "10"))
    repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    stage = []
    # Videos are uploaded ahead of the timed region.  Rationale: this dev
    # environment reaches the chip through an RPC tunnel whose H2D tops out
    # around 20-40 MB/s; on a real v5e host the 27MB uint8 batch moves over
    # PCIe in ~2ms and overlaps compute via double-buffering.  The measured
    # tunnel bandwidth is reported alongside so the exclusion is explicit.
    t_up = time.time()
    uploads = [jnp.asarray(video + i) for i in range(n)]
    _ = [float(u[0, 0, 0, 0, 0]) for u in uploads]  # force completion
    up_s = time.time() - t_up
    h2d_mbps = n * video.nbytes / 1e6 / up_s
    # `repeats` independent passes of `n` batches, ONE sync per pass (per-
    # batch syncs would add a relay RTT to every batch): the headline is the
    # mean and the spread makes round-over-round deltas interpretable
    # (round-4 VERDICT item 5: 3 batches ~ 4.5s of device time was noise-
    # dominated).
    seed = 0
    samples = []
    for rep in range(repeats):
        t0 = time.time()
        for i in range(n):
            seed += 1
            out = one_batch(seed, uploads[i])
        _ = int(out[0, 0])  # force completion (block_until_ready is a no-op
        # through the axon relay; a scalar read is the reliable sync)
        samples.append(n * B / (time.time() - t0))
    clips_per_sec = float(np.mean(samples))
    clips_std = float(np.std(samples))
    dt = n * B / clips_per_sec  # mean seconds per n-batch pass

    # Per-stage attribution, loop-timed: each stage is dispatched K times
    # back-to-back with ONE final sync, so the per-batch figure is device
    # time, not the dev relay's round-trip (a single synced pass was
    # measured to inflate the ~100 ms tokenize stage to ~850 ms of RTT).
    # One un-timed synced pass first: the first loop after the headline
    # run absorbs a one-time relay tail (measured inflating the 46 ms
    # tokenize stage to 130-230 ms; reps right after are stable).
    K = 4

    def _tok_once():
        t = vid_tok.forward(uploads[0], device_out=True)
        return t.reshape(B, -1).astype(jnp.int32)

    _ = int(_tok_once()[0, 0])
    t0 = time.time()
    for _ in range(K):
        tokens = _tok_once()
    _ = int(tokens[0, 0])
    tok_stage_s = (time.time() - t0) / K
    if os.environ.get("BENCH_DEBUG_STAGES"):
        for rep in range(3):
            t0 = time.time()
            for _ in range(K):
                tokens = _tok_once()
            _ = int(tokens[0, 0])
            print(f"# tokenize stage rep{rep}: "
                  f"{(time.time() - t0) / K * 1000:.1f} ms", file=sys.stderr)
    sample = {"tok_rgb": {
        "tensor": tokens,
        "input_mask": np.zeros((B, 5120), dtype=bool),
        "target_mask": np.ones((B, 5120), dtype=bool)}}
    init_empty_target_modality(sample, MODALITY_INFO, "tok_depth", B, 5120)
    init_full_input_modality(sample, MODALITY_INFO, "tok_rgb")
    _ = int(sampler.generate(sample, schedule, top_p=0.8, top_k=0.0,
                             seed=999)["tok_depth"]["tensor"][0, 0])
    t0 = time.time()
    for i in range(K):
        out = sampler.generate(sample, schedule, top_p=0.8, top_k=0.0,
                               seed=1000 + i)["tok_depth"]["tensor"]
    _ = int(out[0, 0])
    gen_stage_s = (time.time() - t0) / K
    stage.append((tok_stage_s, gen_stage_s))

    # Host ingest throughput (SURVEY §7 "hard part"): the native libav
    # decoder's mp4 -> (16,256,256,3) clip rate, single-thread AND thread-
    # pooled (round-4 VERDICT item 6: a v5e-8 host must feed 8 chips).
    # ctypes releases the GIL per decode, so the pool scales with host
    # cores; this box's ceiling is visible in ingest_pool.cpu_count.
    from egom2p_tpu.data.video_ingest import read_videos_pooled
    mp4 = "/root/reference/example_data/rgb2dep_h2o.mp4"
    t_in = time.time()
    n_ing = 8
    for _ in range(n_ing):
        read_video(mp4, out_size=256)
    ingest_cps = n_ing / (time.time() - t_in)
    pool_workers = os.cpu_count() or 1
    t_in = time.time()
    n_pool = max(8, 2 * pool_workers)
    read_videos_pooled([mp4] * n_pool, out_size=256, workers=pool_workers)
    ingest_pool_cps = n_pool / (time.time() - t_in)

    # Un-prestaged end-to-end variant (serial): upload -> compute -> upload,
    # quantifying what the headline's h2d_prestaged exclusion hides.
    t0 = time.time()
    buf = jax.device_put(video)
    for i in range(n):
        nxt = jax.device_put(video + (i + 1)) if i + 1 < n else None
        out = one_batch(100 + i, buf)
        buf = nxt
    _ = int(out[0, 0])  # force final batch completion
    e2e_cps = n * B / (time.time() - t0)

    # Overlapped end-to-end (round-3 VERDICT item 4; SURVEY §7 phase 5
    # "overlap host IO with device compute"): a producer thread runs
    # mp4 ingest + device_put into a depth-2 queue while the main thread
    # keeps the device busy, so feed rides UNDER compute instead of being
    # added to it.  Expected: ~= min(device rate, H2D bound) — on this dev
    # relay the tunnel is the floor; on a real v5e host (PCIe H2D, ~ms)
    # it sustains the device rate.
    import queue as _queue
    import threading

    def _producer(q, n_batches):
        for i in range(n_batches):
            host = read_video(
                "/root/reference/example_data/rgb2dep_h2o.mp4", out_size=256)
            host = np.repeat(host[None], B, axis=0)
            q.put(jax.device_put(host))  # async upload from this thread
        q.put(None)

    q: "_queue.Queue" = _queue.Queue(maxsize=2)
    t0 = time.time()
    threading.Thread(target=_producer, args=(q, n), daemon=True).start()
    i = 0
    while True:
        buf = q.get()
        if buf is None:
            break
        out = one_batch(200 + i, buf)
        i += 1
    _ = int(out[0, 0])
    e2e_overlapped_cps = n * B / (time.time() - t0)

    # tokenizer FLOPs from XLA cost analysis (exact), generation analytic
    padded = np.pad(video, ((0, 0), (0, 1), (0, 0), (0, 0), (0, 0)),
                    mode="edge")
    tok_fl = jax.jit(vid_tok._encode_u8).lower(
        vid_tok.params, jnp.asarray(padded)).compile().cost_analysis()
    tok_flops = float(tok_fl.get("flops", 0.0))
    gen_flops = _gen_flops_per_batch(B)
    mfu = (tok_flops + gen_flops) * n / dt / (V5E_PEAK_TFLOPS * 1e12)

    baseline = None
    bl_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "bench_baseline.json")
    if os.path.exists(bl_path):
        with open(bl_path) as f:
            baseline = json.load(f).get("clips_per_sec_per_chip")

    tok_ms = stage[-1][0] * 1000
    gen_ms = stage[-1][1] * 1000
    result = {
        "metric": "2s-clips/sec/chip (tokenize + rgb2depth infer)",
        "value": round(clips_per_sec, 4),
        "unit": "clips/s/chip",
        "vs_baseline": (round(clips_per_sec / baseline, 3)
                        if baseline else None),
        "stddev": round(clips_std, 4),
        "n": {"batches_per_repeat": n, "repeats": repeats,
              "clips_per_batch": B},
        "batch": B,
        "stage_ms_per_batch": {"tokenize": round(tok_ms, 1),
                               "generate_roar3_cfg": round(gen_ms, 1)},
        "mfu_pct": round(mfu * 100, 1),
        "model_tflops_per_clip": round((tok_flops + gen_flops) / B / 1e12, 2),
        "h2d_prestaged": True,
        "relay_h2d_mbps": round(h2d_mbps, 1),
        "ingest_clips_per_s": round(ingest_cps, 2),
        "ingest_pool": {"workers": pool_workers, "cpu_count": pool_workers,
                        "aggregate_clips_per_s": round(ingest_pool_cps, 2)},
        "e2e_unprestaged_clips_per_s": round(e2e_cps, 3),
        "e2e_overlapped_clips_per_s": round(e2e_overlapped_cps, 3),
        "setup_s": {"model_load": round(load_s, 1),
                    "warmup_compile": round(warmup_s, 1),
                    "new_cache_entries": compiled_new},
    }
    print(json.dumps(result))
    print(f"# setup+compile {setup_s:.1f}s; {repeats} x {n} batches x {B} "
          f"clips, mean pass {dt:.2f}s, stddev {clips_std:.3f} clips/s",
          file=sys.stderr)


if __name__ == "__main__":
    main()

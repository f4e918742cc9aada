#!/usr/bin/env python
"""Training-throughput benchmark: tokens/sec/chip for the EgoM2P-base
pretraining step (2048 encoder + 2048 decoder token budgets, loss_type
'mod'), with an analytic-FLOP MFU estimate.

Single chip; the multi-chip path is validated by __graft_entry__.py's
dryrun (DP/FSDP shardings compile + execute on a virtual mesh) and scales
linearly over the data axes because the step is fully batch-sharded with an
XLA-fused gradient psum (reference anchor: 256xH100 DDP,
README_TRAINING.md:45).

Prints ONE JSON line.  Not the driver's headline bench (that is bench.py);
run manually: python bench_train.py [BATCH=64 STEPS=5 REMAT=0 ACCUM=8]
Zero-flag defaults are the SHIPPED sweet spot (B=64 as 8x8 accum, no
remat, 76.0k tok/s/chip measured round 4); BATCH=8 ACCUM=1 benches the
single-micro-batch step.

REMAT=1 enables full per-block activation checkpointing, REMAT=dots the
selective dots-saveable policy, REMAT=0 (default: B=8 fits HBM) none;
ACCUM=k runs k gradient-accumulation micro-batches of BATCH/k samples
inside the jitted step (lax.scan) — the knobs for trading recompute
against activation HBM.
"""
import json
import os
import sys
import time

V5E_PEAK_TFLOPS = 197.0


def train_flops_per_sample(n_in=2048, n_tgt=2048, n_layers=12, dim=768,
                           h=2048, vocab=64000):
    """Analytic fwd FLOPs; bwd ~= 2x fwd => total 3x.

    Encoder at N=n_in; decoder self at n_tgt + cross to n_in (incl. the
    per-layer K/V projections over the n_in context); the CE head is
    counted at the 64k video vocab for every target token (upper bound: the
    cam/gaze share of the budget uses a 256 vocab)."""
    enc = n_layers * (8 * n_in * dim**2 + 4 * n_in**2 * dim
                      + 6 * n_in * dim * h)
    dec = n_layers * (8 * n_tgt * dim**2 + 4 * n_tgt**2 * dim
                      + 4 * n_tgt * n_in * dim + 4 * n_tgt * dim**2
                      + 4 * n_in * dim**2
                      + 6 * n_tgt * dim * h)
    head = 2 * n_tgt * dim * vocab
    return 3 * (enc + dec + head)


def main():
    from egom2p_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import numpy as np
    import jax
    import optax

    from egom2p_tpu.data import MODALITY_INFO
    from egom2p_tpu.models import create_model
    from egom2p_tpu.train.egom2p_train import (init_train_state,
                                               make_train_step)
    from tests.test_model import make_mod_dict

    t_setup = time.time()
    # Zero-flag defaults = the measured single-chip sweet spot (round-4
    # sweep, docs/TRAINING.md): batch 64 as 8 micro-batches x 8 accum
    # steps, no remat -> 76.0k tok/s / 41.7% MFU on a v5e chip.
    B = int(os.environ.get("BATCH", "64"))
    steps = int(os.environ.get("STEPS", "5"))
    # REMAT=0 none | 1 full per-block | dots selective (save matmul outputs)
    remat = os.environ.get("REMAT", "0")
    accum = int(os.environ.get("ACCUM", "8"))
    MODS = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")
    # with bf16 compute the B=8 step fits HBM without remat and runs ~40%
    # faster (69.9k vs 46.0k tok/s on-chip, round-4 flash64 blocks +
    # flash-CE); remat is the knob for larger micro-batches (B=16
    # full-remat: 49.4k; B=16 no-remat OOMs by 0.5G) — prefer ACCUM=8
    # (76.0k at batch 64)
    model = create_model("egom2p_base_12e_12d_swiglu_nobias", MODS, MODS,
                         use_act_checkpoint=remat != "0",
                         remat_policy="dots" if remat == "dots" else "full")
    rng = np.random.default_rng(0)
    batch = make_mod_dict(rng, batch=B, mods=MODS, n_in=2048, n_tgt=2048,
                          info=MODALITY_INFO)

    params = jax.jit(lambda k: model.init(
        k, batch, 2048, 2048))(jax.random.PRNGKey(0))
    opt = optax.adamw(1e-4, weight_decay=0.05)
    state = init_train_state(params, opt)
    step = jax.jit(make_train_step(model, opt, 2048, 2048,
                                   accum_steps=accum), donate_argnums=0)

    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key)  # compile
    _ = float(metrics["loss"])
    setup_s = time.time() - t_setup

    t0 = time.time()
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.fold_in(key, i))
    _ = float(metrics["loss"])  # sync
    dt = time.time() - t0

    tokens = steps * B * (2048 + 2048)
    tok_s = tokens / dt
    fl = train_flops_per_sample() * B * steps
    mfu = fl / dt / (V5E_PEAK_TFLOPS * 1e12)
    print(json.dumps({
        "metric": "train tokens/s/chip (egom2p-base, 2048+2048)",
        "value": round(tok_s, 1), "unit": "tok/s/chip",
        "batch": B, "steps_per_sec": round(steps / dt, 3),
        "mfu_pct": round(mfu * 100, 1),
        "model_tflops_per_step": round(fl / steps / 1e12, 2),
        # A/B switch state (ops/flash64_train.py routing; docs/DESIGN.md)
        "flash64_train": os.environ.get("EGOM2P_FLASH64_TRAIN", "1") != "0",
        "remat": {"0": False, "1": True}.get(remat, remat),
        "accum_steps": accum,
    }))
    print(f"# setup+compile {setup_s:.1f}s; {steps} steps in {dt:.2f}s",
          file=sys.stderr)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Train-step stage breakdown: where does the 2048+2048 EgoM2P-base step
spend its time on one chip?  (round-3 VERDICT item 3: train MFU 36% vs
50% at inference, no published profile of the backward.)

Measures, each jitted and timed over STEPS reps (min):

  full      fwd + bwd + adamw update      (the shipped train step)
  fwd       loss only
  fwd_bwd   value_and_grad, no optimizer
  ce        forward_loss alone (all 4 modality heads), fwd
  ce_bwd    forward_loss alone, fwd + grad wrt (params, y)
  opt       adamw update + apply on fixed grads

Derived: bwd = fwd_bwd - fwd; encdec_bwd = fwd_bwd - ce_bwd;
optimizer = full - fwd_bwd (cross-check vs direct `opt`).

The CE isolation drives the REAL heads (model.forward_loss with the real
params) on a decoder output of the right shape with a realistic modality
split of the 2048-token target budget (~half rgb / quarter depth /
eighth cam + gaze), so the chunked-logsumexp scan and both 64k heads run
exactly as in training.

Run on chip:  PYTHONPATH=/root/repo:/root/.axon_site python
benchmarks/prof_train_stages.py   [BATCH=8 STEPS=10]
Env A/B knobs: EGOM2P_CE_SKIP / EGOM2P_CE_CHUNK / EGOM2P_FLASH64_TRAIN /
REMAT (0|1|dots).
"""
import json
import os
import time

V5E_PEAK_TFLOPS = 197.0


def timeit(fn, steps, _sync, tag=""):
    """fn must RETURN a scalar jax array; timing fetches it to host each
    rep (float()), because on the remote axon backend block_until_ready
    returns before execution completes — only a value fetch is a true
    barrier (bench.py syncs the same way)."""
    import sys
    print(f"[stage {tag}] compiling...", file=sys.stderr, flush=True)
    float(fn())  # compile + settle
    times = []
    for _ in range(3):
        t0 = time.time()
        for _ in range(steps - 1):
            fn()
        float(fn())  # host fetch = stream barrier
        times.append((time.time() - t0) / steps)
    print(f"[stage {tag}] {min(times)*1e3:.2f} ms", file=sys.stderr,
          flush=True)
    return min(times)


def main():
    from egom2p_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from egom2p_tpu.data import MODALITY_INFO
    from egom2p_tpu.models import create_model
    from egom2p_tpu.models.egom2p import EgoM2P
    from egom2p_tpu.train.egom2p_train import (init_train_state,
                                               make_train_step)
    from tests.test_model import make_mod_dict
    from bench_train import train_flops_per_sample

    B = int(os.environ.get("BATCH", "8"))
    steps = int(os.environ.get("STEPS", "10"))
    remat = os.environ.get("REMAT", "0")
    MODS = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")
    model = create_model("egom2p_base_12e_12d_swiglu_nobias", MODS, MODS,
                         use_act_checkpoint=remat != "0",
                         remat_policy="dots" if remat == "dots" else "full")
    rng = np.random.default_rng(0)
    batch = make_mod_dict(rng, batch=B, mods=MODS, n_in=2048, n_tgt=2048,
                          info=MODALITY_INFO)
    params = jax.jit(lambda k: model.init(
        k, batch, 2048, 2048))(jax.random.PRNGKey(0))
    opt = optax.adamw(1e-4, weight_decay=0.05)
    key = jax.random.PRNGKey(1)

    # HBM discipline: params (1.6G) + adamw state (3.2G) + one transient
    # grad tree must coexist; stages are measured in an order that never
    # holds two optimizer states or an extra grad tree at once, and the
    # full step donates its state.
    step_fn = jax.jit(make_train_step(model, opt, 2048, 2048),
                      donate_argnums=0)
    loss_fn = jax.jit(lambda p, b, r: model.apply(
        p, b, 2048, 2048, "mod", deterministic=False,
        rngs={"shuffle": r, "dropout": jax.random.fold_in(r, 1)})[0])
    grad_fn = jax.jit(lambda p, b, r: jax.value_and_grad(
        lambda q: model.apply(
            q, b, 2048, 2048, "mod", deterministic=False,
            rngs={"shuffle": r, "dropout": jax.random.fold_in(r, 1)})[0])(p))

    # --- CE-head isolation ----------------------------------------------
    # realistic target-budget split: 1024 rgb / 512 depth / 256 cam / 256 gaze
    ids = {m: MODALITY_INFO[m]["id"] for m in MODS}
    mod_mask = np.concatenate([
        np.full(1024, ids["tok_rgb"]), np.full(512, ids["tok_depth"]),
        np.full(256, ids["tok_cam"]), np.full(256, ids["tok_gaze"])])
    mod_mask = jnp.asarray(np.tile(mod_mask, (B, 1)), jnp.int32)
    vocab = np.concatenate([
        np.random.default_rng(1).integers(0, 64000, (B, 1536)),
        np.random.default_rng(2).integers(0, 256, (B, 512))], axis=1)
    tgt = jnp.asarray(vocab, jnp.int32)
    y = jnp.asarray(np.random.default_rng(3).normal(0, 1, (B, 2048, 768)),
                    jnp.bfloat16)

    def ce_loss(p, yy):
        loss, _ = model.apply(p, yy, tgt, mod_mask, "mod", list(MODS),
                              method=EgoM2P.forward_loss)
        return loss

    ce_fwd = jax.jit(ce_loss)
    ce_grad = jax.jit(jax.value_and_grad(ce_loss, argnums=(0, 1)))

    @jax.jit
    def opt_step(s, g):
        updates, new_opt = opt.update(g, s.opt_state, s.params)
        return s._replace(params=optax.apply_updates(s.params, updates),
                          opt_state=new_opt, step=s.step + 1)

    out = {}
    r = [key]

    def tick():
        r[0] = jax.random.fold_in(r[0], 1)
        return r[0]

    # phase 1: params-only stages (no optimizer state live)
    out["fwd"] = timeit(lambda: loss_fn(params, batch, tick()),
                        steps, None, "fwd")
    out["fwd_bwd"] = timeit(lambda: grad_fn(params, batch, tick())[0],
                            steps, None, "fwd_bwd")
    out["ce"] = timeit(lambda: ce_fwd(params, y), steps, None, "ce")
    out["ce_bwd"] = timeit(lambda: ce_grad(params, y)[0],
                           steps, None, "ce_bwd")

    # phase 2: full step, state donated each call
    holder = {"state": init_train_state(params, opt)}

    def run_full():
        holder["state"], m = step_fn(holder["state"], batch, tick())
        return m

    out["full"] = timeit(lambda: run_full()["loss"], steps, None, "full")

    # phase 3: optimizer alone on a fixed grad tree (reuses phase-2 state)
    grads = jax.tree_util.tree_map(
        lambda x: (jnp.ones_like(x) * 1e-4 if x.dtype == jnp.float32 else x),
        holder["state"].params)
    out["opt"] = timeit(lambda: opt_step(holder["state"], grads).step,
                        steps, None, "opt")

    fl = train_flops_per_sample() * B
    ms = {k: round(v * 1e3, 2) for k, v in out.items()}
    report = {
        "metric": "train step stage breakdown (ms, egom2p-base B=%d)" % B,
        "stages_ms": ms,
        "derived_ms": {
            "bwd": round((out["fwd_bwd"] - out["fwd"]) * 1e3, 2),
            "encdec_fwd_bwd": round((out["fwd_bwd"] - out["ce_bwd"]) * 1e3, 2),
            "optimizer_in_step": round((out["full"] - out["fwd_bwd"]) * 1e3, 2),
        },
        "tok_per_s": round(B * 4096 / out["full"], 1),
        "mfu_pct": round(fl / out["full"] / (V5E_PEAK_TFLOPS * 1e12) * 100, 1),
        "backend": jax.default_backend(),
        "remat": remat,
        "ce_skip": os.environ.get("EGOM2P_CE_SKIP", "0"),
        "ce_chunk": os.environ.get("EGOM2P_CE_CHUNK", "default"),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()

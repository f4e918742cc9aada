"""One-process generation A/B bus (round 5, VERDICT item 4).

Runs, in a single TPU process (each fresh process pays minutes of relay
overhead in this environment):
  1. the piecewise fused-step attribution (scalar-sync timeit),
  2. the bench-identical 3-step chain at B=8 vs B=16,
  3. candidate-set truncation K=256 vs 128 for top-p sampling.
Prints a compact table; BENCH-identical semantics throughout.
"""
import functools
import os
import time
import types

import numpy as np

from egom2p_tpu.core.cache import enable_persistent_cache
enable_persistent_cache()
import jax
import jax.numpy as jnp

from egom2p_tpu.cli import eval_common
from egom2p_tpu.data.video_ingest import read_video
from egom2p_tpu.data.modality_info import MODALITY_INFO
from egom2p_tpu.generate import (build_chained_generation_schedules,
                                 init_empty_target_modality,
                                 init_full_input_modality)
import egom2p_tpu.generate.sampler as S
from egom2p_tpu.models.egom2p import EgoM2P
from egom2p_tpu.ops.attention import inference_attention

args = types.SimpleNamespace(
    ckpt="./ckpt/checkpoint-main", video_tok_ckpt="./ckpt/cosmos-dv4x8x8",
    cam_tok_ckpt="./ckpt/checkpoint-cam", gaze_tok_ckpt="./ckpt/checkpoint-gaze",
    model="egom2p_base_12e_12d_swiglu_nobias", smoke=True, seed=0)
model, params = eval_common.load_main_model(args)
vid_tok = eval_common.load_video_tokenizer(args)

clip = read_video("/root/reference/example_data/rgb2dep_h2o.mp4", out_size=256)

schedule = build_chained_generation_schedules(
    cond_domains=["tok_rgb"], target_domains=["tok_depth"],
    tokens_per_target=[5120], autoregression_schemes=["roar"],
    decoding_steps=[3], token_decoding_schedules=["linear"],
    temps=[0.01], temp_schedules=["constant"], cfg_scales=[2.0],
    cfg_schedules=["constant"], cfg_grow_conditioning=True)


def make_sampler():
    return S.GenerationSampler(model, params)


def make_sample(B, tokens):
    s = {"tok_rgb": {"tensor": tokens,
                     "input_mask": np.zeros((B, 5120), bool),
                     "target_mask": np.ones((B, 5120), bool)}}
    init_empty_target_modality(s, MODALITY_INFO, "tok_depth", B, 5120)
    init_full_input_modality(s, MODALITY_INFO, "tok_rgb")
    return s


def tokens_for(B):
    video = jnp.asarray(np.repeat(clip[None], B, axis=0))
    return vid_tok.forward(video, device_out=True).reshape(B, -1).astype(jnp.int32)


def time_chain(sampler, B, tokens, reps=4, tag=""):
    out = sampler.generate(make_sample(B, tokens), schedule, top_p=0.8,
                           top_k=0.0, seed=0)  # compile
    _ = int(out["tok_depth"]["tensor"][0, 0])
    t0 = time.time()
    for i in range(reps):
        out = sampler.generate(make_sample(B, tokens), schedule, top_p=0.8,
                               top_k=0.0, seed=1 + i)
    _ = int(out["tok_depth"]["tensor"][0, 0])
    dt = (time.time() - t0) / reps
    print(f"[chain {tag}] B={B}: {dt*1000:.1f} ms/batch = "
          f"{B/dt:.3f} clips/s", flush=True)
    return dt


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = np.asarray(leaf[(0,) * leaf.ndim])


def timeit(fn, *a, reps=6):
    out = fn(*a)
    _sync(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*a)
    _sync(out)
    return (time.time() - t0) / reps


def pieces(B, tokens):
    L, D, H, V, hmlp = 12, 768, 64, 64000, 2048
    PEAK = 197e12

    def enc_flops(n):
        return L * (8 * n * D**2 + 4 * n**2 * D + 6 * n * D * hmlp) * B

    def dec_flops(k, n):
        return L * (8 * k * D**2 + 4 * k**2 * D + 4 * k * n * D
                    + 4 * k * D**2 + 4 * n * D**2 + 6 * k * D * hmlp) * B

    sampler = make_sampler()
    captured = []
    orig = sampler._fused_img_step_fn

    @functools.wraps(orig)
    def cap(*a, **kw):
        fn = orig(*a, **kw)
        meta = dict(nc=a[1], nu=a[2], k=a[3], cond=a[-1])

        def wrapped(params, dev, ids_keep, key):
            captured.append((meta, {m: dict(d) for m, d in dev.items()},
                             ids_keep, key))
            return fn(params, dev, ids_keep, key)
        return wrapped

    sampler._fused_img_step_fn = cap
    sampler.generate(make_sample(B, tokens), schedule, top_p=0.8, top_k=0.0,
                     seed=0)
    for meta, dev, ids_keep, key in captured:
        nc, nu, k = meta["nc"], meta["nu"], meta["k"]
        un_view = {m: ({**d, "input_mask": jnp.ones_like(d["input_mask"])}
                       if m in meta["cond"] else d) for m, d in dev.items()}
        with inference_attention():
            enc_c = jax.jit(lambda p, d: model.apply(
                p, d, nc, method=EgoM2P.forward_enc_context))
            enc_u = jax.jit(lambda p, d: model.apply(
                p, d, nu, method=EgoM2P.forward_enc_context))

            def dec(p, d, ctx, mask, ids):
                return model.apply(p, d, "tok_depth", ctx, mask, ids,
                                   method=EgoM2P.forward_dec_subset_hidden)
            dec_j = jax.jit(dec)

            def head(p, y, kk):
                return S.chunked_head_sample(model, p, "tok_depth", y, (2.0,),
                                             kk, 0.01, 0.0, 0.8, V)
            head_j = jax.jit(head)

            t_ec = timeit(enc_c, params, dev)
            t_eu = timeit(enc_u, params, un_view)
            ctx_c, mask_c = enc_c(params, dev)
            ctx_u, mask_u = enc_u(params, un_view)
            t_dc = timeit(dec_j, params, dev, ctx_c, mask_c, ids_keep)
            t_du = timeit(dec_j, params, dev, ctx_u, mask_u, ids_keep)
            y_c = dec_j(params, dev, ctx_c, mask_c, ids_keep)
            y_u = dec_j(params, dev, ctx_u, mask_u, ids_keep)
            y = jnp.concatenate([y_c, y_u], axis=0)
            t_h = timeit(head_j, params, y, key)

        rows = [("enc_cond", t_ec, enc_flops(nc)),
                ("enc_uncond", t_eu, enc_flops(nu)),
                ("dec_cond", t_dc, dec_flops(k, nc)),
                ("dec_uncond", t_du, dec_flops(k, nu)),
                ("head+sample", t_h, 2 * k * 768 * V * 2 * B)]
        tot = sum(t for _, t, _ in rows)
        print(f"\npieces B={B} step nc={nc} nu={nu} k={k} "
              f"sum={tot*1000:.1f} ms", flush=True)
        for name, t, f in rows:
            print(f"  {name:12s} {t*1000:7.1f} ms  {f/1e12:6.2f} TF  "
                  f"{f/t/1e12:6.1f} TF/s ({f/t/PEAK*100:4.1f}% peak)",
                  flush=True)


if __name__ == "__main__":
    which = os.environ.get("AB", "pieces,b16,k128")
    tok8 = tokens_for(8)
    base = None
    if "pieces" in which:
        pieces(8, tok8)
    # baseline chain at B=8 (fresh sampler: clean program cache)
    base = time_chain(make_sampler(), 8, tok8, tag="base")
    if "k128" in which:
        old = S._TOPP_TRUNC
        S._TOPP_TRUNC = 128
        time_chain(make_sampler(), 8, tok8, tag="K=128")
        S._TOPP_TRUNC = old
    if "b16" in which:
        tok16 = tokens_for(16)
        time_chain(make_sampler(), 16, tok16, tag="B=16")
    if "chunk" in which:
        # position-chunk size of the 64k head + candidate top-k: larger
        # chunks = fewer approx_max_k dispatches but a bigger live logits
        # buffer ((B, chunk, 64000) fp32)
        real = S.chunked_head_sample

        for c in (512, 1024):
            def patched(model, params, mod, y, w, key, t, tk, tp, v,
                        chunk=256, _c=c):
                return real(model, params, mod, y, w, key, t, tk, tp, v,
                            chunk=_c)
            S.chunked_head_sample = patched
            time_chain(make_sampler(), 8, tok8, tag=f"chunk={c}")
        S.chunked_head_sample = real

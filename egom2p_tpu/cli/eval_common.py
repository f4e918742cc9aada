"""Shared implementation for the four eval_model_* entry points.

Mirrors the reference eval scripts' structure
(reference: eval_model_rgb2depth.py and its diffs for rgb2cam / rgb2gaze /
depth2rgb): load tokenizers + the main model, build the chained ROAR schedule,
encode the conditioning from example data, generate, decode to artifacts.

Checkpoint sources:
  * Orbax directories produced by this framework,
  * reference torch .pth checkpoints via egom2p_tpu.compat.torch_convert,
  * --smoke: random weights, exercising the full pipeline without checkpoints.
"""
from __future__ import annotations

import argparse
import glob
import os
import time
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from egom2p_tpu.core.cache import enable_persistent_cache
from egom2p_tpu.core.checkpoint import load_checkpoint
from egom2p_tpu.data.modality_info import MODALITY_INFO
from egom2p_tpu.data.video_ingest import read_video
from egom2p_tpu.generate import (GenerationSampler,
                                 build_chained_generation_schedules,
                                 init_empty_target_modality,
                                 init_full_input_modality)
from egom2p_tpu.generate.decode import decode_targets
from egom2p_tpu.models.egom2p import create_model
from egom2p_tpu.tokenizers.cosmos import CausalVideoTokenizer
from egom2p_tpu.tokenizers.seq_vqvae import seq_vqvae_from_config

MODS4 = ("tok_cam", "tok_depth", "tok_gaze", "tok_rgb")


def build_argparser(task: str) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=f"EgoM2P-TPU eval: {task}")
    p.add_argument("--ckpt", default="./ckpt/checkpoint-main",
                   help="main model checkpoint (orbax dir or torch .pth)")
    p.add_argument("--video-tok-ckpt", default="./ckpt/cosmos-dv4x8x8",
                   help="Cosmos DV tokenizer checkpoint")
    p.add_argument("--cam-tok-ckpt", default="./ckpt/checkpoint-cam")
    p.add_argument("--gaze-tok-ckpt", default="./ckpt/checkpoint-gaze")
    p.add_argument("--model", default="egom2p_base_12e_12d_swiglu_nobias")
    p.add_argument("--data", default="/root/reference/example_data",
                   help="directory with example clips")
    p.add_argument("--out", default="eval_out")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--smoke", action="store_true",
                   help="random weights; exercises the full pipeline without "
                        "checkpoints")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="serve the main model tensor-parallel over the first "
                        "N devices (Megatron param sharding; hd-64 attention "
                        "keeps the flash kernels via shard_map)")
    return p


def _tensor_parallel_params(params, n: int):
    """Shard the main model over a (1, 1, model=N) serving mesh: Megatron
    column/row/vocab param placement (train/egom2p_train.py:tp_spec), batch
    replicated, and the shard_map flash64 routing registered
    (models/transformer.py:_tp_shard_mapped).  Exceeds the reference, which
    serves single-GPU only."""
    from egom2p_tpu.core.mesh import MeshConfig, make_mesh
    from egom2p_tpu.ops.attention import set_tp_flash_mesh
    from egom2p_tpu.ops.flash_attention import disable_flash
    from egom2p_tpu.train.egom2p_train import tp_param_shardings

    devs = jax.devices()
    if len(devs) < n:  # not assert: must survive python -O with a clear msg
        raise SystemExit(f"--tensor_parallel {n} > {len(devs)} devices")
    disable_flash()  # GSPMD can't partition the stock Pallas custom calls
    mesh = make_mesh(MeshConfig(replica=1, data=1, model=n), devices=devs[:n])
    set_tp_flash_mesh(mesh)
    return jax.device_put(params, tp_param_shardings(mesh, params, n))


def load_main_model(args):
    model_name, in_domains, out_domains = args.model, MODS4, MODS4
    if args.ckpt.endswith(".pth") and os.path.exists(args.ckpt):
        # the reference embeds the argparse namespace in the checkpoint and
        # eval scripts rebuild the model from it
        from egom2p_tpu.compat.torch_convert import read_pth_args
        ck_args = read_pth_args(args.ckpt)
        if ck_args is not None:
            model_name = getattr(ck_args, "model", model_name)
            in_domains = tuple(sorted(getattr(ck_args, "in_domains", MODS4)))
            out_domains = tuple(sorted(getattr(ck_args, "out_domains", MODS4)))
            print(f"model config from checkpoint args: {model_name}")
    model = create_model(model_name, in_domains=in_domains,
                         out_domains=out_domains)
    if args.smoke or not os.path.exists(args.ckpt):
        if not args.smoke:
            print(f"[warn] {args.ckpt} not found -> random weights "
                  f"(pass --smoke to silence)")
        md = _dummy_mod_dict(1)
        params = jax.jit(lambda k: model.init(k, md, 128, 128))(
            jax.random.PRNGKey(0))
    elif args.ckpt.endswith(".pth"):
        from egom2p_tpu.compat.torch_convert import load_egom2p_pth
        params = load_egom2p_pth(args.ckpt, model)
    else:
        params = load_checkpoint(args.ckpt)
        if isinstance(params, dict) and "opt_state" in params:
            params = params["params"]  # full TrainState -> flax variables
    return model, params


def _dummy_mod_dict(batch):
    from egom2p_tpu.compat.torch_convert import shape_mod_dict
    return shape_mod_dict(MODS4, MODALITY_INFO, batch=batch)


def load_video_tokenizer(args) -> CausalVideoTokenizer:
    if args.smoke or not os.path.exists(args.video_tok_ckpt):
        if not args.smoke:
            print(f"[warn] video tokenizer ckpt {args.video_tok_ckpt} "
                  f"missing: RANDOM weights (outputs are not meaningful)")
        return CausalVideoTokenizer.random_init(jax.random.PRNGKey(1))
    if args.video_tok_ckpt.endswith(".jit") or args.video_tok_ckpt.endswith(".pth"):
        from egom2p_tpu.compat.torch_convert import load_cosmos_dv_pth
        # Cosmos ships a split encoder.jit/decoder.jit pair — pick up the
        # sibling decoder automatically when pointed at the encoder
        dec = None
        base = os.path.basename(args.video_tok_ckpt)
        if "encoder" in base:
            cand = os.path.join(os.path.dirname(args.video_tok_ckpt),
                                base.replace("encoder", "decoder"))
            dec = cand if os.path.exists(cand) else None
        return load_cosmos_dv_pth(args.video_tok_ckpt, decoder_path=dec)
    params = load_checkpoint(args.video_tok_ckpt)
    return CausalVideoTokenizer(params)


def load_seq_tokenizer(args, domain: str):
    ckpt = args.cam_tok_ckpt if domain == "cam" else args.gaze_tok_ckpt
    tok = seq_vqvae_from_config(domain, jax.random.PRNGKey(2))
    if args.smoke or not os.path.exists(ckpt):
        if not args.smoke:
            print(f"[warn] {domain} tokenizer ckpt {ckpt} missing: RANDOM "
                  f"weights (outputs are not meaningful)")
        return tok
    if ckpt.endswith(".pth"):
        from egom2p_tpu.compat.torch_convert import load_seq_vqvae_pth
        return load_seq_vqvae_pth(ckpt, domain)
    state = load_checkpoint(ckpt)
    tok.params = state["params"]
    from egom2p_tpu.ops.vq import VQState
    tok.vq_state = VQState(**state["vq_state"])
    return tok


def run_task(task: str, cond_domain: str, target_domain: str,
             decoding_steps: int, args) -> List[Dict]:
    """Run one rgbX->Y eval task over the matching example files.

    Returns per-file timing/output records (used by bench.py)."""
    enable_persistent_cache()
    model, params = load_main_model(args)
    if getattr(args, "tensor_parallel", 1) > 1:
        params = _tensor_parallel_params(params, args.tensor_parallel)
    sampler = GenerationSampler(model, params)

    tokenizers = {}
    # The Cosmos tokenizer is only needed to encode mp4 conditioning or to
    # decode a video target; rgb2cam/rgb2gaze condition on pre-tokenized npz
    # (the reference likewise comments the video tokenizer out there,
    # eval_model_rgb2cam.py) — skipping it saves its whole load/convert.
    needs_video = target_domain in ("tok_rgb", "tok_depth")
    if needs_video:
        tokenizers["tok_vid"] = load_video_tokenizer(args)
    if target_domain == "tok_cam":
        tokenizers["tok_cam"] = load_seq_tokenizer(args, "cam")
    if target_domain == "tok_gaze":
        tokenizers["tok_gaze"] = load_seq_tokenizer(args, "gaze")

    ntoks = MODALITY_INFO[target_domain]["max_tokens"]
    schedule = build_chained_generation_schedules(
        cond_domains=[cond_domain], target_domains=[target_domain],
        tokens_per_target=[ntoks], autoregression_schemes=["roar"],
        decoding_steps=[decoding_steps], token_decoding_schedules=["linear"],
        temps=[0.01], temp_schedules=["constant"],
        cfg_scales=[2.0], cfg_schedules=["constant"],
        cfg_grow_conditioning=True)

    # conditioning sources (reference: eval scripts use mp4 for tok_rgb /
    # tok_depth video inputs and pre-tokenized npz otherwise)
    patterns = {
        ("tok_rgb", "tok_depth"): "rgb2dep_*.mp4",
        ("tok_depth", "tok_rgb"): "dep2rgb_*.mp4",
        ("tok_rgb", "tok_cam"): "rgb2cam_*.npz",
        ("tok_rgb", "tok_gaze"): "rgb2gaze_*.npz",
    }[(cond_domain, target_domain)]
    files = sorted(glob.glob(os.path.join(args.data, patterns)))
    if not files:
        raise SystemExit(f"no inputs matching {patterns} under {args.data}")

    records = []
    for path in files:
        fname = os.path.basename(path)
        print(fname)
        t_start = time.time()
        if path.endswith(".mp4"):
            video = read_video(path, out_size=256)[None]  # already 8fps 256px
            cond_tokens = tokenizers["tok_vid"].forward(video)  # (1,5,32,32)
            cond_tensor = cond_tokens.reshape(1, -1).astype(np.int32)
        else:
            cond_tensor = np.load(path)["arr_0"].reshape(1, -1).astype(np.int32)
        t_tok = time.time()

        sample = {
            cond_domain: {
                "tensor": cond_tensor,
                "input_mask": np.zeros(cond_tensor.shape, dtype=bool),
                "target_mask": np.ones(cond_tensor.shape, dtype=bool),
            }
        }
        init_empty_target_modality(sample, MODALITY_INFO, target_domain, 1, ntoks)
        init_full_input_modality(sample, MODALITY_INFO, cond_domain)

        out = sampler.generate(sample, schedule, top_p=0.8, top_k=0.0,
                               seed=args.seed)
        t_gen = time.time()

        outputs = decode_targets(fname, out, tokenizers, [target_domain],
                                 name=os.path.join(args.out, task))
        t_dec = time.time()
        records.append({
            "file": fname, "tokenize_s": t_tok - t_start,
            "generate_s": t_gen - t_tok, "decode_s": t_dec - t_gen,
            "outputs": outputs,
        })
        print(f"  tokenize {t_tok-t_start:.2f}s generate {t_gen-t_tok:.2f}s "
              f"decode {t_dec-t_gen:.2f}s")
    return records

#!/usr/bin/env python
"""Cam/gaze VQ-VAE tokenizer training + tokenize/reconstruct CLI (TPU-native).

Same user surface as the reference (reference: run_training_vqvae.py):

  train:      python run_training_vqvae.py --config cfgs/vqvae/cam.yaml \
                  --data_path <npy with (N, 60, 4, 4) or (N, 60, 9) samples>
  tokenize:   ... --resume <ckpt> --tokenize --tokenize_path example_data/cam.npy
  reconstruct ... --resume <ckpt> --tokenize --recon --tokenize_path ...

Matches the example round-trip flows (reference:
example_data/tok_cam_example.py:13-25, tok_gaze_example.py:17-31): tokenize
writes `<name>-tok.npz`, --recon writes `<name>-recon.npy` with the
denormalized reconstruction.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


def get_args(argv=None):
    from egom2p_tpu.core.config import parse_args_with_config, str2bool

    p = argparse.ArgumentParser("VQ-VAE tokenizer training", allow_abbrev=False)
    p.add_argument("--run_name", default="auto")
    # Architecture (reference: cfgs/default/tokenization/vqvae/**.yaml)
    p.add_argument("--encoder_type", default="CamTransformer")
    p.add_argument("--decoder_type", default="CamTransformer")
    p.add_argument("--num_frames", type=int, default=60,
                   help="60 for cam/gaze (30 fps x 2s); 16 for rgb/depth")
    p.add_argument("--post_mlp", type=str2bool, default=True)
    p.add_argument("--temporal_downsampling", type=int, default=2)
    # video-domain architecture (reference: run_training_vqvae.py vivit path;
    # tubelet/patch sizes follow the ViViT-B layout its weight-import implies)
    p.add_argument("--input_size", type=int, default=256)
    p.add_argument("--tubelet_size", type=int, default=2)
    p.add_argument("--patch_size", type=int, default=16)
    p.add_argument("--frame_sample_rate", type=int, default=4)
    p.add_argument("--use_npy", action="store_true",
                   help="video samples are .npy (T,H,W,C) uint8 files")
    p.add_argument("--vq_dim", type=int, default=768)
    p.add_argument("--vq_depth", type=int, default=12)
    p.add_argument("--vq_heads", type=int, default=12)
    # perceptual loss hook (reference: run_training_vqvae.py:144-151)
    p.add_argument("--percept_loss_weight", type=float, default=0.0)
    p.add_argument("--percept_loss_type", default="lpips")
    p.add_argument("--image_log_freq", type=int, default=0,
                   help="write gt/recon clips every N epochs (0 = final only)")
    # Quantizer
    p.add_argument("--codebook_size", type=int, default=256)
    p.add_argument("--latent_dim", type=int, default=32)
    p.add_argument("--norm_codes", type=str2bool, default=True)
    p.add_argument("--quantizer_type", default="lucid",
                   choices=["lucid", "taming", "memcodes"])
    p.add_argument("--coef_ema_dead_code", type=float, default=32.0)
    p.add_argument("--code_replacement_policy", default="batch_random")
    p.add_argument("--commitment_weight", type=float, default=1.0)
    p.add_argument("--quantizer_ema_decay", type=float, default=0.99)
    p.add_argument("--kmeans_init", type=str2bool, default=False)
    # encoder warm start + freeze (reference: vqvae.py:501-554, FREEZE_MODULES
    # :32/200-223 via --freeze_enc)
    p.add_argument("--encoder_ckpt", default=None,
                   help="4M DiVAE safetensors for encoder warm start")
    p.add_argument("--freeze_enc", type=str2bool, default=False)
    # Losses
    p.add_argument("--loss_fn", default="mse", choices=["mse", "mse_mask"])
    p.add_argument("--codebook_weight", type=float, default=1.0)
    # Train
    p.add_argument("--dtype", default="fp32")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--opt", default="adamw")
    p.add_argument("--opt_betas", type=float, nargs=2, default=[0.9, 0.99])
    p.add_argument("--blr", type=float, default=2.5e-5)
    p.add_argument("--warmup_lr", type=float, default=1e-6)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--warmup_epochs", type=int, default=5)
    p.add_argument("--batch_size", type=int, default=128)
    p.add_argument("--clip_grad", type=float, default=1.0)
    p.add_argument("--weight_decay", type=float, default=1e-4)
    p.add_argument("--save_ckpt_freq", type=int, default=1)
    p.add_argument("--async_save", type=str2bool, default=True,
                   help="periodic checkpoint writes on a background thread "
                        "(the final save always blocks)")
    p.add_argument("--seed", type=int, default=0)
    # Evaluation (reference: run_training_vqvae.py:778-806 --eval_only,
    # :1296-1419 in-training eval launcher)
    p.add_argument("--eval_freq", type=int, default=1,
                   help="run the loss eval + metric suite every N epochs")
    p.add_argument("--eval_only", action="store_true",
                   help="evaluate --resume checkpoint and exit")
    p.add_argument("--num_eval_metrics_samples", type=int, default=256,
                   help="cap on eval samples for the metric suite")
    p.add_argument("--no_inception", type=str2bool, default=False)
    # ModelEma (reference: run_training_vqvae.py:230-233, 715-724)
    p.add_argument("--model_ema", type=str2bool, default=False)
    p.add_argument("--model_ema_decay", type=float, default=0.9999)
    p.add_argument("--model_ema_update_freq", type=int, default=1)
    # Data
    p.add_argument("--domain", default="cam",
                   help="cam | gaze | rgb | depth | a feature domain "
                        "(CLIP-B16, CLIP-L14, DINOv2-B14[-global], "
                        "DINOv2-G14[-global], ImageBind-H14[-global]); "
                        "feature domains train on frozen-teacher features "
                        "(reference FEAT_MODALITIES, run_training_vqvae.py:78)")
    # feature-teacher options (reference: get_feature_extractor,
    # run_training_vqvae.py:460-481 — hub downloads there, local ckpt here)
    p.add_argument("--teacher_ckpt", default=None,
                   help="local torch checkpoint for the frozen feature "
                        "teacher (CLIP/DINOv2/ImageBind); random init if "
                        "unset (smoke runs only)")
    p.add_argument("--teacher_dtype", default="bf16",
                   choices=["bf16", "fp32"],
                   help="teacher tower compute dtype (bf16 rides the MXU)")
    p.add_argument("--data_path", default=None,
                   help="npy/npz of training clips; cam: (N,60,4,4) poses or "
                        "(N,60,9) canonicalized; gaze: (N,60,2)")
    p.add_argument("--eval_data_path", default=None)
    p.add_argument("--output_dir", default="output/vqvae")
    p.add_argument("--resume", default=None)
    p.add_argument("--auto_resume", action="store_true", default=True)
    # Tokenize / reconstruct mode (reference: run_training_vqvae.py:808-812)
    p.add_argument("--tokenize", action="store_true")
    p.add_argument("--recon", action="store_true")
    p.add_argument("--tokenize_path", default=None)
    p.add_argument("--tokenize_save_path", default="./")
    # logging
    p.add_argument("--log_wandb", action="store_true", default=False)
    p.add_argument("--no_log_wandb", dest="log_wandb", action="store_false")
    p.add_argument("--wandb_project", default="egom2p-tokenizers")
    p.add_argument("--wandb_entity", default=None)
    p.add_argument("--wandb_run_name", default="auto")
    p.add_argument("--print_freq", type=int, default=20)
    # accepted-but-unused reference keys
    for k in ("find_unused_params", "init_weights", "step_eval", "epoch_eval",
              "eval_metrics_freq", "eval_image_log_freq", "num_logged_images",
              "input_size_eval", "imagenet_default_mean_and_std",
              "min_crop_scale", "dtype_percept"):
        p.add_argument(f"--{k}", default=None)
    return parse_args_with_config(p, argv)


VIDEO_DOMAINS = ("rgb", "depth")
SEQ_DOMAINS = ("cam", "gaze")
GRAD_QUANTIZERS = ("taming", "memcodes")


def is_feature_domain(domain: str) -> bool:
    """Feature domains come from the teacher registry (reference
    FEAT_MODALITIES, run_training_vqvae.py:78) — importing it lazily keeps
    `--help` jax-free."""
    if domain in VIDEO_DOMAINS or domain in SEQ_DOMAINS:
        return False
    from egom2p_tpu.models.teachers import TEACHER_SPECS
    if domain not in TEACHER_SPECS:
        raise SystemExit(
            f"unknown --domain {domain!r}; expected one of "
            f"{SEQ_DOMAINS + VIDEO_DOMAINS} or {tuple(TEACHER_SPECS)}")
    return True


def _build_core_module(args):
    """The encoder/decoder core without a quantizer, for grad-VQ wrapping."""
    import jax

    if is_feature_domain(args.domain):
        from egom2p_tpu.models.teachers import TEACHER_SPECS
        from egom2p_tpu.tokenizers.feature_vqvae import FeatureAutoencoder
        spec = TEACHER_SPECS[args.domain]
        grid = 1 if spec.global_pool else spec.grid
        core = FeatureAutoencoder(
            n_channels=spec.feat_dim, latent_dim=args.latent_dim,
            dim=args.vq_dim, depth=args.vq_depth, num_heads=args.vq_heads)
        return core, (1, grid, grid, spec.feat_dim)
    if args.domain in VIDEO_DOMAINS:
        from egom2p_tpu.tokenizers.video_vqvae import VideoAutoencoder
        core = VideoAutoencoder(
            n_channels=3 if args.domain == "rgb" else 1,
            num_frames=args.num_frames, image_size=args.input_size,
            tubelet_t=args.tubelet_size, patch_size=args.patch_size,
            latent_dim=args.latent_dim, dim=args.vq_dim, depth=args.vq_depth,
            num_heads=args.vq_heads)
        x0_shape = (1, args.num_frames, args.input_size, args.input_size,
                    core.n_channels)
    else:
        from egom2p_tpu.tokenizers.seq_vqvae import SeqAutoencoder
        n_channels, mask_input = (9, False) if args.domain == "cam" else (2, True)
        core = SeqAutoencoder(
            n_channels=n_channels, num_frames=args.num_frames,
            latent_dim=args.latent_dim,
            temporal_compress=args.temporal_downsampling,
            mask_input=mask_input, dim=args.vq_dim, depth=args.vq_depth,
            num_heads=args.vq_heads)
        x0_shape = (1, args.num_frames, n_channels + (1 if mask_input else 0))
    return core, x0_shape


def build_grad_tokenizer(args, rng):
    """Gradient-quantizer variant (reference quant_type selection,
    egom2p/vq/vqvae.py:169-198): taming VQ or memcodes."""
    import jax
    import jax.numpy as jnp
    from egom2p_tpu.tokenizers.seq_vqvae import (GradVQAutoencoder,
                                                 GradVQTokenizer)

    core, x0_shape = _build_core_module(args)
    module = GradVQAutoencoder(core=core, quantizer_type=args.quantizer_type,
                               codebook_size=args.codebook_size,
                               latent_dim=args.latent_dim)
    params = module.init(rng, jnp.zeros(x0_shape, jnp.float32))
    return GradVQTokenizer(module=module, params=params)


def build_tokenizer(args, rng):
    if args.quantizer_type in GRAD_QUANTIZERS:
        return build_grad_tokenizer(args, rng)
    if is_feature_domain(args.domain):
        from egom2p_tpu.tokenizers.feature_vqvae import feature_vqvae_from_config

        return feature_vqvae_from_config(
            args.domain, rng, codebook_size=args.codebook_size,
            latent_dim=args.latent_dim, ema_decay=args.quantizer_ema_decay,
            threshold_ema_dead_code=2.0,  # image-like domains use the fixed
                                          # threshold (run_training_vqvae.py:391)
            commitment_weight=args.commitment_weight,
            kmeans_init=args.kmeans_init, norm_codes=args.norm_codes,
            code_replacement_policy=args.code_replacement_policy,
            dim=args.vq_dim, depth=args.vq_depth, num_heads=args.vq_heads)
    if args.domain in VIDEO_DOMAINS:
        from egom2p_tpu.tokenizers.video_vqvae import video_vqvae_from_config

        return video_vqvae_from_config(
            args.domain, rng, num_frames=args.num_frames,
            image_size=args.input_size, tubelet_t=args.tubelet_size,
            patch_size=args.patch_size, codebook_size=args.codebook_size,
            latent_dim=args.latent_dim, ema_decay=args.quantizer_ema_decay,
            threshold_ema_dead_code=2.0,  # video uses the reference's fixed
                                          # threshold (run_training_vqvae.py:391)
            commitment_weight=args.commitment_weight,
            kmeans_init=args.kmeans_init, norm_codes=args.norm_codes,
            code_replacement_policy=args.code_replacement_policy,
            dim=args.vq_dim, depth=args.vq_depth, num_heads=args.vq_heads)
    from egom2p_tpu.tokenizers.seq_vqvae import seq_vqvae_from_config

    return seq_vqvae_from_config(
        args.domain, rng, num_frames=args.num_frames,
        temporal_compress=args.temporal_downsampling,
        codebook_size=args.codebook_size, latent_dim=args.latent_dim,
        ema_decay=args.quantizer_ema_decay,
        threshold_ema_dead_code=(args.coef_ema_dead_code
                                 / args.codebook_size),
        commitment_weight=args.commitment_weight,
        kmeans_init=args.kmeans_init,
        code_replacement_policy=args.code_replacement_policy,
        dim=args.vq_dim, depth=args.vq_depth, num_heads=args.vq_heads)


def load_tokenizer_state(tok, path, domain):
    """Restore params + codebook from an orbax checkpoint or a reference .pth."""
    import jax.numpy as jnp
    from egom2p_tpu.ops.vq import VQState

    if path.endswith(".pth"):
        from egom2p_tpu.compat.torch_convert import load_seq_vqvae_pth
        loaded = load_seq_vqvae_pth(path, domain)
        tok.params, tok.vq_state = loaded.params, loaded.vq_state
        return tok
    from egom2p_tpu.core.checkpoint import load_checkpoint
    state = load_checkpoint(path)
    tok.params = state["params"]
    if "vq_state" in state and hasattr(tok, "vq_state"):
        vq = state["vq_state"]
        tok.vq_state = VQState(**{k: jnp.asarray(v) for k, v in vq.items()
                                  if v is not None})
    return tok


def prepare_samples(args, path: str) -> (np.ndarray, str):
    """Domain preprocessing for tokenize/recon inputs
    (reference: cam_traj_dataset.py:59-63, gaze_dataset.py:105-110)."""
    from egom2p_tpu.data.cam_gaze import (canonicalize_cam, convert_gaze,
                                          normalize_cam)
    data = np.load(path)
    if hasattr(data, "files"):
        data = data[data.files[0]]
    name = os.path.basename(path).split(".")[0]
    name += "-recon" if args.recon else "-tok"
    if args.domain == "cam":
        if data.ndim == 3 and data.shape[-2:] == (4, 4):
            data = canonicalize_cam(data)
        elif data.ndim == 4 and data.shape[-2:] == (4, 4):
            data = np.stack([canonicalize_cam(d) for d in data])
        x = normalize_cam(data).astype(np.float32)
    else:
        if data.shape[-1] == 2:
            # holoassist example params (reference: gaze_dataset.py:105-110)
            data = convert_gaze(data, orig_res=[896, 504],
                                resize_res=[896, 504], new_res=[480, 480])
        x = data.astype(np.float32)
    if x.ndim == 2:  # single clip (T, C) -> batch of one; (N, T, C) stays
        x = x[None]
    return x, name


def run_tokenize_video(args, tok):
    """Pre-tokenize a directory of mp4/npy clips (reference VideoDataset
    'tokenize' mode, video_dataset.py:165-167 + run_training_vqvae.py:1771-1816)."""
    from egom2p_tpu.data.video_dataset import VideoClipDataset
    from egom2p_tpu.tokenizers.cosmos.video_api import tensor2numpy

    ds = VideoClipDataset(args.tokenize_path, mode="tokenize",
                          clip_len=args.num_frames, crop_size=args.input_size,
                          frame_sample_rate=args.frame_sample_rate,
                          domain=args.domain, use_npy=args.use_npy)
    out_dir = os.path.join(args.tokenize_save_path, "token")
    os.makedirs(out_dir, exist_ok=True)
    outs = []
    for i in range(len(ds)):
        clip = ds[i][None]
        name = os.path.splitext(os.path.basename(ds.samples[i]))[0]
        if args.recon:
            rec = np.asarray(tok.autoencode(clip))[0]
            out = os.path.join(out_dir, f"{name}-recon.npy")
            np.save(out, rec)
            if args.domain == "rgb":
                from egom2p_tpu.data.video_ingest import write_video
                write_video(os.path.join(out_dir, f"{name}-recon.mp4"),
                            tensor2numpy(rec), fps=8.0)
        else:
            tokens = np.asarray(tok.tokenize(clip))[0].astype(np.int16)
            out = os.path.join(out_dir, f"{name}-tok.npz")
            np.savez(out, tokens)
        outs.append(out)
        print(f"saved {out}")
    return outs


def run_tokenize_features(args, tok):
    """Pre-tokenize images into teacher-feature tokens — the artifacts the
    pretrain registry consumes as tok_clip@224 / tok_dinov2@224 / ...
    (reference: modality_info.py:194-205 pretokenized entries)."""
    feat_fn, _ = build_teacher(args)
    images = load_image_data(args, args.tokenize_path)
    feats = extract_features(feat_fn, images, args.batch_size)
    name = os.path.basename(os.path.normpath(args.tokenize_path)).split(".")[0]
    name += "-recon" if args.recon else "-tok"
    out_dir = os.path.join(args.tokenize_save_path, "token")
    os.makedirs(out_dir, exist_ok=True)
    chunks = [feats[i:i + args.batch_size]
              for i in range(0, len(feats), args.batch_size)]
    if args.recon:
        rec = np.concatenate([np.asarray(tok.autoencode(c)) for c in chunks])
        out = os.path.join(out_dir, f"{name}.npy")
        np.save(out, rec)
    else:
        tokens = np.concatenate(
            [np.asarray(tok.tokenize(c)) for c in chunks]).astype(np.int16)
        out = os.path.join(out_dir, f"{name}.npz")
        np.savez(out, tokens)
    print(f"saved {out}")
    return out


def run_tokenize(args):
    import jax
    from egom2p_tpu.data.cam_gaze import denormalize_cam, denormalize_gaze

    tok = build_tokenizer(args, jax.random.PRNGKey(args.seed))
    if args.resume:
        tok = load_tokenizer_state(tok, args.resume, args.domain)
    else:
        print("[warn] --tokenize without --resume: random weights")

    if args.domain in VIDEO_DOMAINS:
        return run_tokenize_video(args, tok)
    if is_feature_domain(args.domain):
        return run_tokenize_features(args, tok)

    x, name = prepare_samples(args, args.tokenize_path)
    out_dir = os.path.join(args.tokenize_save_path, "token")
    os.makedirs(out_dir, exist_ok=True)
    if args.recon:
        rec = np.asarray(tok.autoencode(x))
        if rec.shape[0] == 1:
            rec = rec[0]
        rec = (denormalize_cam(rec) if args.domain == "cam"
               else denormalize_gaze(rec))
        out = os.path.join(out_dir, f"{name}.npy")
        np.save(out, rec)
    else:
        tokens = np.asarray(tok.tokenize(x)).astype(np.int16)
        if tokens.shape[0] == 1:
            tokens = tokens[0]
        out = os.path.join(out_dir, f"{name}.npz")
        np.savez(out, tokens)
    print(f"saved {out}")
    return out


def eval_image_log(args, tok, state, epoch, dataset):
    """Write ground-truth/reconstruction clips for visual inspection
    (reference: run_training_vqvae.py:1818-1970 writes gt/recon mp4s)."""
    import jax
    from egom2p_tpu.tokenizers.cosmos.video_api import tensor2numpy

    out_dir = os.path.join(args.output_dir, "image_logs")
    os.makedirs(out_dir, exist_ok=True)
    tok.params = state.params
    if hasattr(state, "vq_state"):
        tok.vq_state = state.vq_state
    gt = dataset[0][None]
    rec = np.asarray(jax.device_get(tok.autoencode(gt)))[0]
    paths = []
    for tag, clip in (("gt", gt[0]), ("recon", rec)):
        if args.domain == "rgb":
            from egom2p_tpu.data.video_ingest import write_video
            path = os.path.join(out_dir, f"ep{epoch}_{tag}.mp4")
            write_video(path, tensor2numpy(clip), fps=8.0)
        else:  # depth: single channel -> npy (reference saves npys for depth)
            path = os.path.join(out_dir, f"ep{epoch}_{tag}.npy")
            np.save(path, clip)
        paths.append(path)
    print(f"image log: {paths}")
    return paths


def load_seq_data(args, path: str) -> np.ndarray:
    """Load + canonicalize + normalize a cam/gaze training npy
    (reference: cam_traj_dataset.py:156-182)."""
    from egom2p_tpu.data.cam_gaze import canonicalize_cam, normalize_cam
    data = np.load(path)
    if hasattr(data, "files"):
        data = data[data.files[0]]
    if args.domain == "cam" and data.ndim == 4:
        data = np.stack([canonicalize_cam(d) for d in data])
    if args.domain == "cam":
        data = normalize_cam(data)
    return data.astype(np.float32)


class _FrameView:
    """Single frames out of a clip dataset: feature domains train on images
    (the reference feeds image batches, run_training_vqvae.py:949-951)."""

    def __init__(self, ds):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        return self.ds[int(i)][0]


def load_image_data(args, path: str):
    """RGB images for feature-domain training: .npy/.npz of (N, H, W, 3)
    (uint8 or [-1, 1] float) or a directory of videos whose frames are
    treated as images.  The teacher resizes to its own input size."""
    if os.path.isdir(path) or path.endswith((".mp4", ".MP4")):
        from egom2p_tpu.data.video_dataset import VideoClipDataset
        return _FrameView(VideoClipDataset(
            path, mode="train", clip_len=1, crop_size=args.input_size,
            frame_sample_rate=args.frame_sample_rate, domain="rgb",
            use_npy=args.use_npy, seed=args.seed))
    data = np.load(path)
    if hasattr(data, "files"):
        data = data[data.files[0]]
    if data.dtype == np.uint8:
        data = data.astype(np.float32) / 127.5 - 1.0
    return data.astype(np.float32)


def build_teacher(args):
    """Frozen feature teacher as a jitted extractor fn (reference
    get_feature_extractor + on-the-fly extraction in load_sample,
    run_training_vqvae.py:460-481, 949-1002).  bf16 by default: the tower
    is inference-only, so its matmuls should ride the MXU at half width."""
    import jax
    import jax.numpy as jnp
    from egom2p_tpu.models.teachers import get_feature_extractor

    module, params, spec = get_feature_extractor(
        args.domain, args.teacher_ckpt, jax.random.PRNGKey(args.seed))
    dtype = jnp.bfloat16 if args.teacher_dtype == "bf16" else jnp.float32
    params = jax.tree_util.tree_map(lambda p: p.astype(dtype), params)

    @jax.jit
    def feat_fn(rgb):
        return module.apply(params, rgb.astype(dtype)).astype(jnp.float32)

    return feat_fn, spec


def extract_features(feat_fn, images, batch_size: int, limit=None) -> np.ndarray:
    """Teacher features for a host-side image collection, batched through
    the jitted tower."""
    import jax
    n = len(images) if limit is None else min(len(images), limit)
    outs = []
    for i in range(0, n, batch_size):
        if isinstance(images, np.ndarray):
            b = images[i:i + batch_size]
        else:
            b = np.stack([images[j] for j in range(i, min(i + batch_size, n))])
        outs.append(np.asarray(jax.device_get(feat_fn(b))))
    return np.concatenate(outs)


def build_eval_data(args, fallback=None, feat_fn=None):
    """Eval dataset from --eval_data_path; falls back to the training data
    when absent (the reference requires a separate eval set; training-set
    eval is still a meaningful reconstruction/codebook health check).
    Feature domains return precomputed teacher features."""
    if args.domain in VIDEO_DOMAINS:
        if not args.eval_data_path:
            return fallback
        from egom2p_tpu.data.video_dataset import VideoClipDataset
        return VideoClipDataset(
            args.eval_data_path, mode="val", clip_len=args.num_frames,
            crop_size=args.input_size,
            frame_sample_rate=args.frame_sample_rate, domain=args.domain,
            use_npy=args.use_npy)
    if is_feature_domain(args.domain):
        images = (load_image_data(args, args.eval_data_path)
                  if args.eval_data_path else fallback)
        if images is None:
            return None
        return extract_features(feat_fn, images, args.batch_size,
                                limit=args.num_eval_metrics_samples)
    if not args.eval_data_path:
        return fallback
    return load_seq_data(args, args.eval_data_path)


def _state_payload(state) -> dict:
    """Checkpoint payload: full train state with the optimizer tree stored as
    flat leaves (topology-free; rebuilt against the live treedef on resume)."""
    import jax
    payload = {"params": state.params, "step": state.step,
               "opt_leaves": {f"l{i}": x for i, x in enumerate(
                   jax.tree_util.tree_leaves(state.opt_state))}}
    if hasattr(state, "vq_state"):
        payload["vq_state"] = state.vq_state._asdict()
    if state.ema_params is not None:
        payload["ema_params"] = state.ema_params
    return payload


def _restore_state(state, loaded: dict):
    """Merge a restored payload into a fresh train state (old checkpoints may
    carry only params+vq_state; missing fields keep their fresh values)."""
    import jax
    import jax.numpy as jnp
    from egom2p_tpu.ops.vq import VQState

    updates = {"params": loaded["params"]}
    if "step" in loaded:
        updates["step"] = jnp.asarray(loaded["step"])
    if "opt_leaves" in loaded:
        tdef = jax.tree_util.tree_structure(state.opt_state)
        leaves = [loaded["opt_leaves"][f"l{i}"]
                  for i in range(len(loaded["opt_leaves"]))]
        updates["opt_state"] = jax.tree_util.tree_unflatten(tdef, leaves)
    if "vq_state" in loaded and hasattr(state, "vq_state"):
        vq = loaded["vq_state"]
        updates["vq_state"] = VQState(**{k: jnp.asarray(v)
                                         for k, v in vq.items()
                                         if v is not None})
    if "ema_params" in loaded:
        updates["ema_params"] = loaded["ema_params"]
    elif state.ema_params is not None:
        # resuming with --model_ema from a pre-EMA checkpoint: seed the EMA
        # from the restored weights, not the fresh random init (matches the
        # reference ModelEma(model) construction from loaded weights)
        import jax
        updates["ema_params"] = jax.tree_util.tree_map(
            jax.numpy.array, loaded["params"])
    return state._replace(**updates)


def run_train(args):
    import jax
    import optax
    from egom2p_tpu.core.cache import enable_persistent_cache
    from egom2p_tpu.core.checkpoint import auto_load_model, save_checkpoint
    from egom2p_tpu.core.logging import JsonlLogger, MetricLogger
    from egom2p_tpu.core.mesh import make_mesh, num_data_shards
    from egom2p_tpu.core.schedules import as_optax_schedule, cosine_scheduler
    from egom2p_tpu.train.vqvae_train import (init_train_state,
                                              make_vqvae_train_step)

    enable_persistent_cache()
    mesh = make_mesh()
    world = num_data_shards(mesh)
    global_batch = args.batch_size * world

    assert args.data_path, "--data_path required for training"
    video_domain = args.domain in VIDEO_DOMAINS
    feat_domain = is_feature_domain(args.domain)
    dataset = None
    feat_fn = None
    if video_domain:
        from egom2p_tpu.data.video_dataset import VideoClipDataset
        dataset = VideoClipDataset(
            args.data_path, mode="train", clip_len=args.num_frames,
            crop_size=args.input_size,
            frame_sample_rate=args.frame_sample_rate, domain=args.domain,
            use_npy=args.use_npy, seed=args.seed)
        n_samples = len(dataset)
        print(f"train videos: {n_samples}")
    elif feat_domain:
        data = load_image_data(args, args.data_path)
        n_samples = len(data)
        feat_fn, _ = build_teacher(args)
        print(f"train images: {n_samples} ({args.domain} features)")
    else:
        data = load_seq_data(args, args.data_path)
        n_samples = len(data)
        print(f"train samples: {data.shape}")

    tok = build_tokenizer(args, jax.random.PRNGKey(args.seed))
    if args.encoder_ckpt:
        from egom2p_tpu.compat.torch_convert import load_divae_encoder_warm_start
        tok.params = load_divae_encoder_warm_start(args.encoder_ckpt,
                                                   tok.params)
    niter_per_ep = max(n_samples // global_batch, 1)
    lr = args.blr * global_batch / 256.0
    sched = cosine_scheduler(lr, args.min_lr, args.epochs, niter_per_ep,
                             warmup_epochs=args.warmup_epochs,
                             start_warmup_value=args.warmup_lr)
    optimizer = optax.chain(
        optax.clip_by_global_norm(args.clip_grad),
        optax.adamw(as_optax_schedule(sched), b1=args.opt_betas[0],
                    b2=args.opt_betas[1], weight_decay=args.weight_decay))
    if args.freeze_enc:
        from egom2p_tpu.core.optim import freeze_masked, freeze_modules_mask
        optimizer = optax.chain(
            optimizer, freeze_masked(freeze_modules_mask(
                tok.params, ("encoder", "quant_proj"))))
    percept = None
    if video_domain and args.percept_loss_weight > 0.0:
        from egom2p_tpu.core.image_metrics import make_perceptual_loss
        percept = make_perceptual_loss(args.percept_loss_type)
    grad_vq = args.quantizer_type in GRAD_QUANTIZERS
    ema_decay = args.model_ema_decay if args.model_ema else None
    if args.model_ema:
        print(f"Using EMA with decay = {args.model_ema_decay:.8f}")
    if grad_vq:
        from egom2p_tpu.train.vqvae_train import (GradVQTrainState,
                                                  make_grad_vqvae_train_step)
        step_fn = jax.jit(make_grad_vqvae_train_step(
            tok.module, optimizer, loss_fn=args.loss_fn,
            codebook_weight=args.codebook_weight, ema_decay=ema_decay,
            ema_update_freq=args.model_ema_update_freq))
        state = GradVQTrainState(
            tok.params, optimizer.init(tok.params),
            jax.numpy.zeros((), jax.numpy.int32),
            ema_params=(jax.tree_util.tree_map(jax.numpy.array, tok.params)
                        if args.model_ema else None))
    else:
        step_fn = jax.jit(make_vqvae_train_step(
            tok.module, tok.vq_cfg, optimizer, loss_fn=args.loss_fn,
            codebook_weight=args.codebook_weight, ema_decay=ema_decay,
            ema_update_freq=args.model_ema_update_freq,
            percept_loss=percept, percept_weight=args.percept_loss_weight))
        if args.kmeans_init and not bool(np.asarray(tok.vq_state.initted)):
            # data-dependent kmeans codebook init runs once on the host
            # before jit (the reference does it lazily in the first forward,
            # quantize_lucid.py:137-167); without this the codebook would
            # train from all-zero rows
            from egom2p_tpu.ops.vq import kmeans_init_state
            if video_domain:
                first = dataset[0][None]
            elif feat_domain:
                first = extract_features(feat_fn, data, args.batch_size,
                                         limit=min(n_samples, 64))
            else:
                first = data[:min(len(data), 256)]
            lat = tok.module.apply(
                tok.params, jax.numpy.asarray(first),
                method=type(tok.module).encode_latents)
            tok.vq_state = kmeans_init_state(
                tok.vq_cfg, np.asarray(lat).reshape(-1, tok.vq_cfg.dim),
                jax.random.PRNGKey(args.seed + 1))
            print("kmeans codebook init from first batch")
        state = init_train_state(tok.params, optimizer, tok.vq_state,
                                 use_ema=args.model_ema)

    start_epoch = 0
    if args.auto_resume and not args.resume:
        loaded, path = auto_load_model(args.output_dir)
        if loaded is not None:
            state = _restore_state(state, loaded)
            start_epoch = int(np.asarray(state.step)) // niter_per_ep
            print(f"resumed from {path} at epoch {start_epoch}")

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed + 1)
    jsonl = JsonlLogger(args.output_dir)
    eval_data = None
    if args.eval_freq:  # eval data is epoch-invariant; build it once
        eval_data = build_eval_data(
            args, fallback=dataset if video_domain else data, feat_fn=feat_fn)
    batch_iter = (dataset.iter_batches(global_batch) if video_domain else None)
    for epoch in range(start_epoch, args.epochs):
        logger = MetricLogger(print_freq=args.print_freq)
        order = None if video_domain else rng.permutation(n_samples)
        for it, _ in logger.log_every(range(niter_per_ep),
                                      header=f"Epoch [{epoch}]",
                                      total=niter_per_ep):
            if video_domain:
                batch = next(batch_iter)
            else:
                idx = order[it * global_batch:(it + 1) * global_batch]
                batch = (data[idx] if isinstance(data, np.ndarray)
                         else np.stack([data[int(j)] for j in idx]))
                if feat_domain:  # frozen-teacher features, on device
                    batch = feat_fn(batch)
            key, k = jax.random.split(key)
            state, metrics = step_fn(state, batch, k)
            logger.update(**{m: float(v) for m, v in metrics.items()})
        epoch_stats = {"epoch": epoch,
                       **{k: v.global_avg for k, v in logger.meters.items()}}
        if args.eval_freq and (epoch + 1) % args.eval_freq == 0:
            from egom2p_tpu.train.vqvae_eval import run_eval_suite
            eval_stats = run_eval_suite(
                tok, state, eval_data, args.domain, args.codebook_size,
                args.loss_fn, args.codebook_weight, args.batch_size,
                limit=args.num_eval_metrics_samples, mesh=mesh,
                no_inception=args.no_inception)
            print(f"[Eval] epoch {epoch}: "
                  + "  ".join(f"{k}={v:.6g}" for k, v in eval_stats.items()))
            epoch_stats.update({f"eval_{k}" if not k.startswith(("eval_",
                                                                 "ema_"))
                                else k: v for k, v in eval_stats.items()})
        jsonl.write(epoch_stats)
        if (epoch + 1) % args.save_ckpt_freq == 0 or epoch == args.epochs - 1:
            tag = epoch if epoch != args.epochs - 1 else "final"
            blocking = epoch == args.epochs - 1 or not args.async_save
            save_checkpoint(args.output_dir, tag, _state_payload(state),
                            blocking=blocking)
        if video_domain and (
                epoch == args.epochs - 1
                or (args.image_log_freq
                    and (epoch + 1) % args.image_log_freq == 0)):
            eval_image_log(args, tok, state, epoch, dataset)
    from egom2p_tpu.core.checkpoint import wait_for_saves
    wait_for_saves()  # join any in-flight async periodic save before exit
    return state


def run_eval_only(args):
    """Evaluate a checkpoint and exit (reference: run_training_vqvae.py:778-806
    runs eval_metrics + eval_image_log for each eval size, then exit(0))."""
    import json

    import jax
    from egom2p_tpu.train.vqvae_eval import _EvalView, eval_metrics, \
        evaluate_loss

    tok = build_tokenizer(args, jax.random.PRNGKey(args.seed))
    if args.resume:
        tok = load_tokenizer_state(tok, args.resume, args.domain)
    else:
        from egom2p_tpu.core.checkpoint import latest_checkpoint
        path = latest_checkpoint(args.output_dir)
        assert path, "--eval_only needs --resume or checkpoints in output_dir"
        tok = load_tokenizer_state(tok, path, args.domain)

    eval_path = args.eval_data_path or args.data_path or args.tokenize_path
    assert eval_path, "--eval_only needs --eval_data_path (or --data_path)"
    if args.domain in VIDEO_DOMAINS:
        from egom2p_tpu.data.video_dataset import VideoClipDataset
        eval_data = VideoClipDataset(
            eval_path, mode="val", clip_len=args.num_frames,
            crop_size=args.input_size,
            frame_sample_rate=args.frame_sample_rate, domain=args.domain,
            use_npy=args.use_npy)
    elif is_feature_domain(args.domain):
        feat_fn, _ = build_teacher(args)
        eval_data = extract_features(feat_fn, load_image_data(args, eval_path),
                                     args.batch_size,
                                     limit=args.num_eval_metrics_samples)
    else:
        eval_data = load_seq_data(args, eval_path)

    view = _EvalView(tok, tok.params, getattr(tok, "vq_state", None))
    results = dict(evaluate_loss(
        view, eval_data, args.loss_fn, args.codebook_weight, args.batch_size,
        tok.module.n_channels, limit=args.num_eval_metrics_samples))
    results.update(eval_metrics(
        view, eval_data, args.domain, args.codebook_size, args.batch_size,
        limit=args.num_eval_metrics_samples, no_inception=args.no_inception))
    print("[Eval only] " + "  ".join(f"{k}={v:.6g}"
                                     for k, v in results.items()))
    if args.domain in VIDEO_DOMAINS and len(eval_data):
        # gt/recon clip dump alongside the metrics (reference :800-805)
        shim = argparse.Namespace(params=tok.params)
        eval_image_log(args, tok, shim, "eval", eval_data)
    os.makedirs(args.output_dir, exist_ok=True)
    out = os.path.join(args.output_dir, "eval_results.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"saved {out}")
    return results


if __name__ == "__main__":
    args = get_args()
    if args.eval_only:
        run_eval_only(args)
    elif args.tokenize:
        run_tokenize(args)
    else:
        run_train(args)

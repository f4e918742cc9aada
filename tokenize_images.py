#!/usr/bin/env python
"""Run the Cosmos image tokenizer (CI/DI) over plain images.

TPU-native equivalent of the reference's image CLI
(reference: cosmos_tokenizer/image_cli.py:16-197): globs images, optionally
resamples the short side, autoencodes each through the CI or DI tokenizer, and
writes reconstructions (and optionally the resized inputs / DI token grids).

Usage:
    python tokenize_images.py --image_pattern 'imgs/*.jpg' \
        --checkpoint_enc ckpt/encoder.jit --checkpoint_dec ckpt/decoder.jit \
        --tokenizer_type DI --spatial_compression 16 --output_dir ./recon
"""
import argparse
import glob
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--image_pattern", type=str, required=True,
                   help="Glob pattern of input images.")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="Full autoencoder .pth/.jit (torch state dict).")
    p.add_argument("--checkpoint_enc", type=str, default=None)
    p.add_argument("--checkpoint_dec", type=str, default=None)
    p.add_argument("--tokenizer_type", type=str, choices=["CI", "DI"],
                   default="DI")
    p.add_argument("--spatial_compression", type=int, choices=[8, 16],
                   default=16)
    p.add_argument("--short_size", type=int, default=None,
                   help="Resample the short side to this many pixels.")
    p.add_argument("--output_dir", type=str, default=None)
    p.add_argument("--save_input", action="store_true",
                   help="Also write the (resized) input image.")
    p.add_argument("--save_codes", action="store_true",
                   help="DI only: write the token grid as <name>_codes.npy.")
    p.add_argument("--random_init", action="store_true",
                   help="Random weights (smoke testing without checkpoints).")
    return p.parse_args(argv)


def read_image(path: str) -> np.ndarray:
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"), dtype=np.uint8)


def write_image(path: str, image: np.ndarray) -> None:
    from PIL import Image
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    Image.fromarray(image).save(path)


def resize_image(image: np.ndarray, short_size=None) -> np.ndarray:
    """Short-side resample (reference: utils.py resize_image)."""
    if short_size is None:
        return image
    from PIL import Image
    h, w = image.shape[:2]
    if h < w:
        nh, nw = short_size, int(round(w * short_size / h))
    else:
        nh, nw = int(round(h * short_size / w)), short_size
    return np.asarray(Image.fromarray(image).resize((nw, nh), Image.LANCZOS))


def build_tokenizer(args):
    import dataclasses

    import jax

    from egom2p_tpu.tokenizers.cosmos.image_api import ImageTokenizer
    from egom2p_tpu.tokenizers.cosmos.image_network import (
        CI8x8_CONFIG, CI_CONFIG, ContinuousImageTokenizer, DI8x8_CONFIG,
        DI_CONFIG, DiscreteImageTokenizer)

    discrete = args.tokenizer_type == "DI"
    if args.spatial_compression == 8:
        cfg = DI8x8_CONFIG if discrete else CI8x8_CONFIG
    else:
        cfg = DI_CONFIG if discrete else CI_CONFIG

    if args.random_init:
        # small eval resolution keeps init cheap; the net is fully conv
        import jax.numpy as jnp
        module = (DiscreteImageTokenizer if discrete
                  else ContinuousImageTokenizer)(cfg)
        x0 = jnp.zeros((1, 4 * cfg.spatial_compression,
                        4 * cfg.spatial_compression, 3), jnp.float32)
        params = jax.jit(lambda k: module.init(k, x0))(jax.random.PRNGKey(0))
        return ImageTokenizer(params, cfg, discrete=discrete)

    from egom2p_tpu.compat.torch_convert import load_cosmos_image_pth
    enc = args.checkpoint or args.checkpoint_enc
    dec = None if args.checkpoint else args.checkpoint_dec
    if enc is None:
        sys.exit("Need --checkpoint / --checkpoint_enc (+ --checkpoint_dec), "
                 "or --random_init for smoke tests.")
    return load_cosmos_image_pth(enc, dec, cfg=cfg, discrete=discrete)


def output_path(filepath: str, output_dir) -> str:
    base = os.path.basename(filepath)
    out_dir = output_dir or os.path.join(os.path.dirname(filepath),
                                         "reconstructions")
    return os.path.join(out_dir, base)


def main(argv=None):
    args = parse_args(argv)
    filepaths = sorted(glob.glob(args.image_pattern))
    if not filepaths:
        sys.exit(f"no images match {args.image_pattern!r}")
    tok = build_tokenizer(args)
    print(f"[tokenize_images] {len(filepaths)} images, "
          f"{args.tokenizer_type} f{args.spatial_compression}")

    save_codes = args.save_codes and args.tokenizer_type == "DI"
    for fp in filepaths:
        image = resize_image(read_image(fp), args.short_size)
        batch = image[None]
        out_fp = output_path(fp, args.output_dir)
        os.makedirs(os.path.dirname(out_fp), exist_ok=True)
        if save_codes:
            # one encoder pass feeds both the codes file and (via decode)
            # the reconstruction — tok.forward would encode a second time
            from egom2p_tpu.tokenizers.cosmos.image_api import (
                numpy2tensor, pad_image_batch, tensor2numpy,
                unpad_image_batch)
            padded, crop = pad_image_batch(batch, tok.cfg.spatial_compression)
            indices, _codes = tok.encode(numpy2tensor(padded))
            np.save(os.path.splitext(out_fp)[0] + "_codes.npy",
                    np.asarray(indices[0]))
            recon_t = np.asarray(tok.decode(indices), dtype=np.float32)
            recon = unpad_image_batch(tensor2numpy(recon_t), crop)[0]
        else:
            recon = tok.forward(batch)[0]
        write_image(out_fp, recon)
        if args.save_input:
            stem, ext = os.path.splitext(out_fp)
            write_image(stem + "_input" + ext, image)
        print(f"  {fp} -> {out_fp}")


if __name__ == "__main__":
    main()

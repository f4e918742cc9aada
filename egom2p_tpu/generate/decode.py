"""Output decoding for eval pipelines.

Equivalent of the reference plotting/decoding helpers
(reference: egom2p/utils/plotting_utils.py:103-131, 159-192, 744-801):
token grids -> mp4 (video modalities) or .npy (cam/gaze) artifacts.
"""
from __future__ import annotations

import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from egom2p_tpu.data.cam_gaze import CAM_MEAN, CAM_STD, GAZE_MEAN, GAZE_STD
from egom2p_tpu.data.video_ingest import write_video
from egom2p_tpu.tokenizers.cosmos.video_api import tensor2numpy


def decode_tok_vid(filename: str, mod_dict, tokenizers, key: str = "tok_rgb",
                   name: str = "tmp", grid=(5, 32, 32)) -> str:
    """Video tokens -> mp4 at 8 fps; depth is written as channel-mean gray
    (reference: plotting_utils.py:103-131)."""
    toks = np.asarray(mod_dict[key]["tensor"])
    if toks.ndim != 4:
        toks = toks.reshape(toks.shape[0], *grid)
    rec = tokenizers["tok_vid"].decode(jnp.asarray(toks))  # (B, 17, 256, 256, 3)
    video = tensor2numpy(np.asarray(rec, dtype=np.float32))
    video = video[:, :16]  # crop the padded frame (reference: [0,0,0,16,256,256])
    if key == "tok_depth":
        mean = video.mean(axis=-1, keepdims=True).astype(np.uint8)
        video = np.repeat(mean, 3, axis=-1)
    os.makedirs(name, exist_ok=True)
    out = f"{name}/{filename}_{key}.mp4"
    write_video(out, video[0], fps=8)
    print("decode", key, "to", out)
    return out


def decode_tok_cam(filename: str, mod_dict, tokenizers, key: str = "tok_cam",
                   name: str = "tmp") -> str:
    """(reference: plotting_utils.py:159-169)"""
    toks = jnp.asarray(np.asarray(mod_dict[key]["tensor"]))
    rec = np.asarray(tokenizers[key].decode_tokens(toks))
    rec = rec * CAM_STD + CAM_MEAN
    os.makedirs(name, exist_ok=True)
    out = f"{name}/{filename}_{key}.npy"
    np.save(out, rec[0])
    print("decode", key, "to", out)
    return out


def decode_tok_gaze(filename: str, mod_dict, tokenizers, key: str = "tok_gaze",
                    name: str = "tmp") -> str:
    """(reference: plotting_utils.py:171-180)"""
    toks = jnp.asarray(np.asarray(mod_dict[key]["tensor"]))
    rec = np.asarray(tokenizers[key].decode_tokens(toks))
    rec = rec[..., :2] * GAZE_STD + GAZE_MEAN
    os.makedirs(name, exist_ok=True)
    out = f"{name}/{filename}_{key}.npy"
    np.save(out, rec[0])
    print("decode", key, "to", out)
    return out


_DECODERS = {
    "tok_rgb": decode_tok_vid,
    "tok_depth": decode_tok_vid,
    "tok_cam": decode_tok_cam,
    "tok_gaze": decode_tok_gaze,
}


def decode_targets(filename: str, mod_dict, tokenizers, target_mods,
                   name: str = "tmp") -> Dict[str, str]:
    """Decode only the generated target modalities
    (reference: decode_depth/decode_rgb/decode_cam/decode_gaze,
    plotting_utils.py:744-801)."""
    out = {}
    for key in target_mods:
        out[key] = _DECODERS[key](filename, mod_dict, tokenizers, key=key,
                                  name=name)
    return out

"""User-facing causal video tokenizer API.

Equivalent of the reference CausalVideoTokenizer inference wrapper
(reference: cosmos_tokenizer/video_lib.py:33-152): slides a 17-frame temporal
window over arbitrary-length video, pads spatio-temporally to the tokenizer's
alignment, and emits token grids; `decode` maps token grids back to video.

Input convention matches the reference: uint8 video (B, T, H, W, 3) in
[0..255]; internally converted to [-1, 1] (reference: utils.py:253-272).
"""
from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from egom2p_tpu.tokenizers.cosmos.network import (CausalDiscreteVideoTokenizer,
                                                  DiscreteVideoConfig,
                                                  DV4x8x8_CONFIG)


def pad_video_batch(batch: np.ndarray, temporal_align: int = 8,
                    spatial_align: int = 16) -> Tuple[np.ndarray, List[int]]:
    """Zero-pad spatially, edge-pad temporally so (T-1) % temporal_align == 0
    (reference: cosmos_tokenizer/utils.py:325-380)."""
    num_frames, height, width = batch.shape[-4:-1]
    hp = (spatial_align - height % spatial_align) % spatial_align
    wp = (spatial_align - width % spatial_align) % spatial_align
    fp = (temporal_align - (num_frames - 1) % temporal_align) % temporal_align
    crop_region = [fp >> 1, hp >> 1, wp >> 1,
                   num_frames + (fp >> 1), height + (hp >> 1), width + (wp >> 1)]
    batch = np.pad(batch, ((0, 0), (0, 0), (hp >> 1, hp - (hp >> 1)),
                           (wp >> 1, wp - (wp >> 1)), (0, 0)), mode="constant")
    batch = np.pad(batch, ((0, 0), (fp >> 1, fp - (fp >> 1)), (0, 0), (0, 0),
                           (0, 0)), mode="edge")
    return batch, crop_region


def unpad_video_batch(batch: np.ndarray, crop_region: List[int]) -> np.ndarray:
    f1, y1, x1, f2, y2, x2 = crop_region
    return batch[..., f1:f2, y1:y2, x1:x2, :]


def numpy2tensor(video: np.ndarray) -> np.ndarray:
    """uint8 [0..255] (B,T,H,W,3) -> fp32 [-1,1] (reference: utils.py:253-272)."""
    return (video.astype(np.float32) / 255.0) * 2.0 - 1.0


def tensor2numpy(video: np.ndarray) -> np.ndarray:
    """fp32 [-1,1] -> uint8 [0..255] (reference: utils.py:275-288)."""
    x = (np.asarray(video, dtype=np.float32) + 1.0) / 2.0
    return (np.clip(x, 0, 1) * 255.0 + 0.5).astype(np.uint8)


def sliding_window_autoencode(autoencode_fn, video_uint8,
                              temporal_window: int, temporal_align: int,
                              spatial_align: int) -> np.ndarray:
    """Reconstruct arbitrary-length uint8 video window by window: pad each
    `temporal_window` slice to the compression alignment, run
    `autoencode_fn` ([-1,1] fp32 in/out), and unpad back
    (reference: video_lib_ori.py:122-154, video_lib.py:118-152)."""
    assert video_uint8.ndim == 5
    num_frames = video_uint8.shape[1]
    outs = []
    for idx in range((num_frames - 1) // temporal_window + 1):
        window = np.asarray(
            video_uint8[:, idx * temporal_window:(idx + 1) * temporal_window])
        padded, crop = pad_video_batch(window, temporal_align, spatial_align)
        recon = autoencode_fn(jnp.asarray(numpy2tensor(padded)))
        outs.append(unpad_video_batch(tensor2numpy(recon), crop))
    return np.concatenate(outs, axis=1)


class CausalVideoTokenizer:
    """Bundles the flax network + params with encode/decode/forward."""

    def __init__(self, params, cfg: DiscreteVideoConfig = DV4x8x8_CONFIG,
                 compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.module = CausalDiscreteVideoTokenizer(cfg)
        self.params = params
        self.compute_dtype = compute_dtype
        self._encode = jax.jit(lambda p, x: self.module.apply(
            p, x.astype(compute_dtype), method=CausalDiscreteVideoTokenizer.encode))
        # uint8 fast path: ship 1/4 the bytes to the device and convert
        # to [-1, 1] in-graph (reference converts on host, utils.py:253-272)
        self._encode_u8 = jax.jit(lambda p, x: self.module.apply(
            p, (x.astype(compute_dtype) / 127.5) - 1.0,
            method=CausalDiscreteVideoTokenizer.encode))

        def _encode_u8_padded(p, x):
            # in-graph pad_video_batch (shapes are static under trace), so the
            # host ships the raw unpadded uint8 frames and does zero numpy
            # work; zero-padding uint8 == padding with black, identical to the
            # reference's pre-conversion pad (utils.py:325-380)
            ta = 2 * self.cfg.temporal_compression
            sa = 2 * self.cfg.spatial_compression
            T, H, W = x.shape[1:4]
            hp, wp = (sa - H % sa) % sa, (sa - W % sa) % sa
            fp = (ta - (T - 1) % ta) % ta
            x = jnp.pad(x, ((0, 0), (0, 0), (hp >> 1, hp - (hp >> 1)),
                            (wp >> 1, wp - (wp >> 1)), (0, 0)))
            x = jnp.pad(x, ((0, 0), (fp >> 1, fp - (fp >> 1)), (0, 0), (0, 0),
                            (0, 0)), mode="edge")
            return self.module.apply(
                p, (x.astype(compute_dtype) / 127.5) - 1.0,
                method=CausalDiscreteVideoTokenizer.encode)

        self._encode_u8_padded = jax.jit(_encode_u8_padded)
        self._decode_code = jax.jit(lambda p, i: self.module.apply(
            p, i, method=CausalDiscreteVideoTokenizer.decode_code))

    @classmethod
    def random_init(cls, rng: jax.Array, cfg: DiscreteVideoConfig = DV4x8x8_CONFIG,
                    frames: int = 17, size: int = 256, **kw):
        module = CausalDiscreteVideoTokenizer(cfg)
        x0 = jnp.zeros((1, frames, size, size, 3), jnp.float32)
        params = jax.jit(lambda k: module.init(k, x0))(rng)
        return cls(params, cfg, **kw)

    def encode(self, video_pm1: jnp.ndarray):
        """(B, T, H, W, 3) in [-1,1] -> (indices, codes)."""
        return self._encode(self.params, video_pm1)

    def decode(self, indices: jnp.ndarray):
        """(B, t, h, w) token indices -> video (B, 1+(t-1)*pt, H, W, 3) in [-1,1]."""
        return self._decode_code(self.params, indices)

    def autoencode(self, video_pm1: jnp.ndarray):
        """encode -> decode round trip on one padded window
        (reference: video_lib_ori.py:85-99)."""
        indices, _ = self.encode(video_pm1)
        return self.decode(indices)

    def reconstruct(self, video_uint8, temporal_window: int = 17) -> np.ndarray:
        """Reconstruct arbitrary-length uint8 video through the autoencoder
        with a sliding temporal window; returns uint8 (B, T', H, W, 3)
        (reference: video_lib_ori.py:122-154 -- the upstream copy whose
        forward() returns reconstructed video instead of tokens)."""
        return sliding_window_autoencode(
            self.autoencode, video_uint8, temporal_window,
            2 * self.cfg.temporal_compression,
            2 * self.cfg.spatial_compression)

    def forward(self, video_uint8, temporal_window: int = 17,
                device_out: bool = False):
        """Tokenize arbitrary-length uint8 video with a sliding temporal window
        (reference: video_lib.py:118-152).  Returns (B, t_total, h, w) int32.

        `video_uint8` may be host numpy or an already-uploaded device array;
        padding happens in-graph.  With device_out=True the token grid stays
        on device (no readback) for pipelines that feed it straight into
        generation."""
        assert video_uint8.ndim == 5
        num_frames = video_uint8.shape[1]
        out = []
        for idx in range((num_frames - 1) // temporal_window + 1):
            window = video_uint8[:, idx * temporal_window:(idx + 1) * temporal_window]
            indices, _ = self._encode_u8_padded(self.params,
                                                jnp.asarray(window))
            out.append(indices if device_out else np.asarray(indices))
        if device_out:
            return out[0] if len(out) == 1 else jnp.concatenate(out, axis=1)
        return np.concatenate(out, axis=1)

    __call__ = forward


class ContinuousVideoTokenizer:
    """CV (continuous latent) counterpart of CausalVideoTokenizer
    (reference: video_lib.py:84-116 handles both; the continuous branch
    returns a latent instead of indices)."""

    def __init__(self, params, cfg=None, compute_dtype=jnp.bfloat16):
        from egom2p_tpu.tokenizers.cosmos.network import (
            CausalContinuousVideoTokenizer, CV8x8x8_CONFIG)
        self.cfg = cfg or CV8x8x8_CONFIG
        self.module = CausalContinuousVideoTokenizer(self.cfg)
        self.params = params
        self.compute_dtype = compute_dtype
        cls = CausalContinuousVideoTokenizer
        self._encode = jax.jit(lambda p, x: self.module.apply(
            p, x.astype(compute_dtype), method=cls.encode))
        self._decode = jax.jit(lambda p, z: self.module.apply(
            p, z.astype(compute_dtype), method=cls.decode))

    @classmethod
    def random_init(cls, rng: jax.Array, cfg=None, frames: int = 17,
                    size: int = 256, **kw):
        from egom2p_tpu.tokenizers.cosmos.network import (
            CausalContinuousVideoTokenizer, CV8x8x8_CONFIG)
        cfg = cfg or CV8x8x8_CONFIG
        module = CausalContinuousVideoTokenizer(cfg)
        x0 = jnp.zeros((1, frames, size, size, 3), jnp.float32)
        params = jax.jit(lambda k: module.init(k, x0))(rng)
        return cls(params, cfg, **kw)

    def encode(self, video_pm1):
        """(B, T, H, W, 3) in [-1,1] -> latent (B, t, h, w, C) (AE mean)."""
        latent, _post = self._encode(self.params, jnp.asarray(video_pm1))
        return (latent,)

    def decode(self, latent):
        return self._decode(self.params, jnp.asarray(latent))

    def autoencode(self, video_pm1):
        return self.decode(self.encode(video_pm1)[0])

    def forward(self, video_uint8, temporal_window: int = 17) -> np.ndarray:
        """uint8 (B,T,H,W,3) -> reconstructed uint8, windowed like the
        reference (video_lib.py:118-152)."""
        return sliding_window_autoencode(
            self.autoencode, video_uint8, temporal_window,
            2 * self.cfg.temporal_compression,
            2 * self.cfg.spatial_compression)

    __call__ = forward

"""User-facing image tokenizer API.

Equivalent of the reference ImageTokenizer inference wrapper
(reference: cosmos_tokenizer/image_lib.py:32-128): pads a batch of images to
the tokenizer's spatial alignment, encodes/decodes/autoencodes, and maps back
to uint8.  Input convention matches the reference: uint8 (B, H, W, 3) in
[0..255] for `forward`; [-1, 1] float tensors for encode/decode/autoencode.
"""
from __future__ import annotations

from typing import List, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from egom2p_tpu.tokenizers.cosmos.image_network import (
    CI_CONFIG, ContinuousImageTokenizer, DI_CONFIG, DiscreteImageTokenizer,
    ImageTokenizerConfig)
from egom2p_tpu.tokenizers.cosmos.video_api import numpy2tensor, tensor2numpy

_SPATIAL_ALIGN = 16


def pad_image_batch(batch: np.ndarray,
                    spatial_align: int = _SPATIAL_ALIGN
                    ) -> Tuple[np.ndarray, List[int]]:
    """Center-pad BxHxWxC to a multiple of `spatial_align`
    (reference: utils.py:290-327)."""
    height, width = batch.shape[1:3]
    hp = (spatial_align - height % spatial_align) % spatial_align
    wp = (spatial_align - width % spatial_align) % spatial_align
    crop_region = [hp >> 1, wp >> 1, height + (hp >> 1), width + (wp >> 1)]
    batch = np.pad(batch, ((0, 0), (hp >> 1, hp - (hp >> 1)),
                           (wp >> 1, wp - (wp >> 1)), (0, 0)),
                   mode="constant")
    return batch, crop_region


def unpad_image_batch(batch: np.ndarray, crop_region: List[int]) -> np.ndarray:
    """(reference: utils.py:397-409)."""
    y1, x1, y2, x2 = crop_region
    return batch[..., y1:y2, x1:x2, :]


class ImageTokenizer:
    """Bundles the flax 2D network + params with encode/decode/forward.

    `module` is a DiscreteImageTokenizer (DI) or ContinuousImageTokenizer
    (CI); which one decides encode's return signature, mirroring the
    reference's CI/DI split (image_lib.py:93-111)."""

    def __init__(self, params,
                 cfg: ImageTokenizerConfig = DI_CONFIG,
                 discrete: bool = True,
                 compute_dtype=jnp.bfloat16):
        self.cfg = cfg
        self.discrete = discrete
        cls = DiscreteImageTokenizer if discrete else ContinuousImageTokenizer
        self.module = cls(cfg)
        self.params = params
        self.compute_dtype = compute_dtype
        if discrete:
            self._encode = jax.jit(lambda p, x: self.module.apply(
                p, x.astype(compute_dtype), method=cls.encode))
            self._decode_code = jax.jit(lambda p, i: self.module.apply(
                p, i, method=cls.decode_code))
        else:
            self._encode = jax.jit(lambda p, x: self.module.apply(
                p, x.astype(compute_dtype), method=cls.encode))
            self._decode = jax.jit(lambda p, z: self.module.apply(
                p, z.astype(compute_dtype), method=cls.decode))

    # --- [-1,1] tensor-level API (reference: image_lib.py:61-111) ----------
    def encode(self, input_tensor):
        """CI: (latent,); DI: (indices, codes)."""
        out = self._encode(self.params, jnp.asarray(input_tensor))
        if self.discrete:
            indices, codes, _loss = out
            return indices, codes
        latent, _posteriors = out
        return (latent,)

    def decode(self, input_latent):
        """CI: latent (B,h,w,C) -> image; DI: indices (B,h,w) -> image."""
        if self.discrete:
            return self._decode_code(self.params, jnp.asarray(input_latent))
        return self._decode(self.params, jnp.asarray(input_latent))

    def autoencode(self, input_tensor):
        out = self.encode(input_tensor)
        return self.decode(out[0])

    # --- uint8 numpy-level API (reference: image_lib.py:113-128) -----------
    def forward(self, image: np.ndarray) -> np.ndarray:
        """uint8 (B, H, W, 3) [0..255] -> reconstructed uint8 same layout."""
        padded, crop_region = pad_image_batch(
            image, spatial_align=self.cfg.spatial_compression)
        tensor = numpy2tensor(padded)
        recon = np.asarray(self.autoencode(tensor), dtype=np.float32)
        return unpad_image_batch(tensor2numpy(recon), crop_region)

"""Cosmos image tokenizers: discrete (DI) and continuous (CI).

Reimplements cosmos_tokenizer/networks/discrete_image.py:28-129 and
continuous_image.py:32-104 with the 2D encoder/decoder from layers2d.py in
channels-last JAX.  Default configs mirror the reference's
networks/configs.py:26-98 (CI/DI, f16 spatial compression, haar patch 4).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from egom2p_tpu.ops.fsq import FSQ, LFQ, ResidualFSQ
from egom2p_tpu.ops.quantizers import TamingVectorQuantizer
from egom2p_tpu.tokenizers.cosmos.distributions import (gaussian_distribution,
                                                        identity_distribution)
from egom2p_tpu.tokenizers.cosmos.layers2d import (Decoder2d, Encoder2d,
                                                   _conv2d)


@dataclasses.dataclass(frozen=True)
class ImageTokenizerConfig:
    """(reference: networks/configs.py:26-98)."""
    attn_resolutions: Tuple[int, ...] = (32,)
    channels: int = 128
    channels_mult: Tuple[int, ...] = (2, 4, 4)
    dropout: float = 0.0
    in_channels: int = 3
    spatial_compression: int = 16
    num_res_blocks: int = 2
    out_channels: int = 3
    resolution: int = 1024
    patch_size: int = 4
    patch_method: str = "haar"
    # continuous (CI)
    latent_channels: int = 16
    z_channels: int = 16
    z_factor: int = 1
    formulation: str = "AE"  # or "VAE"
    # discrete (DI)
    quantizer: str = "FSQ"   # VQ | LFQ | FSQ | RESFSQ
    embedding_dim: int = 6
    levels: Tuple[int, ...] = (8, 8, 8, 5, 5, 5)
    num_quantizers: int = 4
    num_embeddings: Optional[int] = None  # for VQ
    codebook_size: int = 65536            # for LFQ
    codebook_dim: int = 16                # for LFQ


CI_CONFIG = ImageTokenizerConfig()
DI_CONFIG = ImageTokenizerConfig(z_channels=256)
# The public CI8x8 variant (spatial f8).
CI8x8_CONFIG = ImageTokenizerConfig(spatial_compression=8)
DI8x8_CONFIG = ImageTokenizerConfig(z_channels=256, spatial_compression=8)


class DiscreteImageTokenizer(nn.Module):
    """encoder -> quant_conv -> quantizer -> post_quant_conv -> decoder
    (reference: networks/discrete_image.py:28-129)."""
    cfg: ImageTokenizerConfig = DI_CONFIG

    def setup(self):
        cfg = self.cfg
        self.encoder = Encoder2d(cfg)
        self.decoder = Decoder2d(cfg)
        q = cfg.quantizer
        # LFQ consumes codebook_dim channels (one bit per channel); the
        # other quantizers take embedding_dim latents
        quant_ch = cfg.codebook_dim if q == "LFQ" else cfg.embedding_dim
        self.quant_conv = _conv2d(quant_ch, kernel=1, padding=0)
        self.post_quant_conv = _conv2d(cfg.z_channels, kernel=1, padding=0)
        if q == "FSQ":
            self.quantizer = FSQ(cfg.levels)
        elif q == "RESFSQ":
            self.quantizer = ResidualFSQ(cfg.levels, cfg.num_quantizers)
        elif q == "LFQ":
            self.quantizer = LFQ(cfg.codebook_dim)
        elif q == "VQ":
            assert cfg.num_embeddings, "`num_embeddings` required for VQ"
            self.quantizer = TamingVectorQuantizer(
                cfg.num_embeddings, cfg.embedding_dim, beta=0.25)
        else:
            raise ValueError(f"unknown quantizer {q!r}")

    def encode(self, x):
        """x: (B, H, W, 3) in [-1, 1] -> (indices, codes, quant_loss)."""
        h = self.encoder(x)
        h = self.quant_conv(h)
        if self.cfg.quantizer == "VQ":
            b, gh, gw, c = h.shape
            z_q, loss, (indices, *_rest) = self.quantizer(
                h.reshape(b, gh * gw, c).astype(jnp.float32))
            return (indices.reshape(b, gh, gw),
                    z_q.reshape(b, gh, gw, c), loss)
        out = self.quantizer(h.astype(jnp.float32))
        indices, codes = out[0], out[1]
        loss = out[2] if len(out) > 2 else jnp.zeros((), jnp.float32)
        return indices, codes, loss

    def decode(self, codes):
        """codes: (B, h, w, embedding_dim) -> image (B, H, W, 3)."""
        h = self.post_quant_conv(codes)
        return self.decoder(h)

    def decode_code(self, indices):
        if self.cfg.quantizer == "VQ":
            codes = self.quantizer.get_codebook_entry(indices)
        else:
            codes = self.quantizer.indices_to_codes(indices)
        return self.decode(codes)

    def __call__(self, x):
        indices, codes, quant_loss = self.encode(x)
        recon = self.decode(codes)
        return recon, indices, quant_loss


class ContinuousImageTokenizer(nn.Module):
    """AE/VAE image tokenizer (reference: networks/continuous_image.py:32-104)."""
    cfg: ImageTokenizerConfig = CI_CONFIG

    def setup(self):
        cfg = self.cfg
        # encoder emits z_factor * z_channels; for a VAE z_factor=2 carries
        # (mean, logvar) just like the reference's quant_conv doubling
        self.encoder = Encoder2d(cfg)
        self.decoder = Decoder2d(cfg)
        self.quant_conv = _conv2d(cfg.z_factor * cfg.latent_channels,
                                  kernel=1, padding=0)
        self.post_quant_conv = _conv2d(cfg.z_channels, kernel=1, padding=0)

    def _distribution(self, moments, rng=None):
        if self.cfg.formulation == "VAE":
            return gaussian_distribution(moments, rng)
        return identity_distribution(moments)

    def encode(self, x, rng=None):
        """x: (B, H, W, 3) in [-1, 1] -> (latent, (mean, logvar))."""
        h = self.encoder(x)
        moments = self.quant_conv(h)
        return self._distribution(moments, rng)

    def decode(self, z):
        z = self.post_quant_conv(z)
        return self.decoder(z)

    def __call__(self, x, rng=None):
        latent, posteriors = self.encode(x, rng)
        recon = self.decode(latent)
        return recon, posteriors, latent

"""Cosmos causal discrete video tokenizer network (DV, FSQ).

Reimplements CausalDiscreteVideoTokenizer with the FACTORIZED encoder/decoder
(reference: cosmos_tokenizer/networks/discrete_video.py:33-145,
cosmos_tokenizer/modules/layers3d.py:731-1040) in channels-last JAX.

The released EgoM2P checkpoints use Cosmos-0.1-Tokenizer-**DV4x8x8**
(README.md:89): temporal compression 4 (all via the causal Haar patcher,
patch_size=4), spatial compression 8 (4x patch + one hybrid spatial
downsample).  A 17-frame 256x256 clip maps to a 5x32x32 grid of 64k-FSQ
tokens.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from egom2p_tpu.ops.fsq import FSQ
from egom2p_tpu.ops.wavelet import (patch2d_haar, patch2d_rearrange,
                                    patch3d_haar, patch3d_rearrange,
                                    unpatch2d_haar, unpatch2d_rearrange,
                                    unpatch3d_haar, unpatch3d_rearrange)
from egom2p_tpu.tokenizers.cosmos.layers import (CausalAttnBlock,
                                                 CausalConv3d,
                                                 CausalDownsample3d,
                                                 CausalHybridDownsample3d,
                                                 CausalHybridUpsample3d,
                                                 CausalNormalize,
                                                 CausalResnetBlock3d,
                                                 CausalResnetBlockFactorized3d,
                                                 CausalTemporalAttnBlock,
                                                 CausalUpsample3d,
                                                 nonlinearity)


@dataclasses.dataclass(frozen=True)
class DiscreteVideoConfig:
    """(reference: cosmos_tokenizer/networks/configs.py:123-146, adjusted to
    the DV4x8x8 checkpoint's compression rates)."""
    channels: int = 128
    channels_mult: Tuple[int, ...] = (2, 4, 4)
    num_res_blocks: int = 2
    attn_resolutions: Tuple[int, ...] = (32,)
    dropout: float = 0.0
    in_channels: int = 3
    out_channels: int = 3
    resolution: int = 1024
    patch_size: int = 4
    patch_method: str = "haar"
    z_channels: int = 16
    z_factor: int = 1
    num_groups: int = 1
    legacy_mode: bool = False
    spatial_compression: int = 8
    temporal_compression: int = 4
    embedding_dim: int = 6
    levels: Tuple[int, ...] = (8, 8, 8, 5, 5, 5)
    encoder: str = "FACTORIZED"  # or "BASE" (reference: Encoder3DType)
    decoder: str = "FACTORIZED"


DV4x8x8_CONFIG = DiscreteVideoConfig()
# The public Cosmos DV8x16x16 variant (reference: configs.py:123-146 verbatim)
DV8x16x16_CONFIG = DiscreteVideoConfig(spatial_compression=16,
                                       temporal_compression=8)


class EncoderFactorized(nn.Module):
    """(reference: layers3d.py:731-884)"""
    cfg: DiscreteVideoConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        num_resolutions = len(cfg.channels_mult)
        num_spatial_downs = int(math.log2(cfg.spatial_compression)) - int(
            math.log2(cfg.patch_size))
        num_temporal_downs = int(math.log2(cfg.temporal_compression)) - int(
            math.log2(cfg.patch_size))

        if cfg.patch_method == "haar":
            x = patch3d_haar(x, cfg.patch_size)
        else:
            x = patch3d_rearrange(x, cfg.patch_size)

        h = CausalConv3d(cfg.channels, (1, 3, 3), padding=1, name="conv_in_0")(x)
        h = CausalConv3d(cfg.channels, (3, 1, 1), padding=0, name="conv_in_1")(h)

        curr_res = cfg.resolution // cfg.patch_size
        in_ch_mult = (1,) + tuple(cfg.channels_mult)
        for i_level in range(num_resolutions):
            block_out = cfg.channels * cfg.channels_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = CausalResnetBlockFactorized3d(
                    block_out, num_groups=1, dropout=cfg.dropout,
                    name=f"down_{i_level}_block_{i_block}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = CausalAttnBlock(1, name=f"down_{i_level}_attn_{i_block}_s")(h)
                    h = CausalTemporalAttnBlock(
                        1, name=f"down_{i_level}_attn_{i_block}_t")(h)
            if i_level != num_resolutions - 1:
                h = CausalHybridDownsample3d(
                    spatial_down=i_level < num_spatial_downs,
                    temporal_down=i_level < num_temporal_downs,
                    name=f"down_{i_level}_downsample")(h)
                curr_res //= 2

        block_in = cfg.channels * cfg.channels_mult[-1]
        h = CausalResnetBlockFactorized3d(block_in, num_groups=1,
                                          dropout=cfg.dropout, name="mid_block_1")(h)
        h = CausalAttnBlock(1, name="mid_attn_1_s")(h)
        h = CausalTemporalAttnBlock(1, name="mid_attn_1_t")(h)
        h = CausalResnetBlockFactorized3d(block_in, num_groups=1,
                                          dropout=cfg.dropout, name="mid_block_2")(h)

        h = CausalNormalize(1, name="norm_out")(h)
        h = nonlinearity(h)
        z = cfg.z_factor * cfg.z_channels
        h = CausalConv3d(z, (1, 3, 3), padding=1, name="conv_out_0")(h)
        h = CausalConv3d(z, (3, 1, 1), padding=0, name="conv_out_1")(h)
        return h


class DecoderFactorized(nn.Module):
    """(reference: layers3d.py:887-1040)"""
    cfg: DiscreteVideoConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        num_resolutions = len(cfg.channels_mult)
        num_spatial_ups = int(math.log2(cfg.spatial_compression)) - int(
            math.log2(cfg.patch_size))
        num_temporal_ups = int(math.log2(cfg.temporal_compression)) - int(
            math.log2(cfg.patch_size))

        block_in = cfg.channels * cfg.channels_mult[-1]
        h = CausalConv3d(block_in, (1, 3, 3), padding=1, name="conv_in_0")(z)
        h = CausalConv3d(block_in, (3, 1, 1), padding=0, name="conv_in_1")(h)

        h = CausalResnetBlockFactorized3d(block_in, num_groups=1,
                                          dropout=cfg.dropout, name="mid_block_1")(h)
        h = CausalAttnBlock(1, name="mid_attn_1_s")(h)
        h = CausalTemporalAttnBlock(1, name="mid_attn_1_t")(h)
        h = CausalResnetBlockFactorized3d(block_in, num_groups=1,
                                          dropout=cfg.dropout, name="mid_block_2")(h)

        for i_level in reversed(range(num_resolutions)):
            block_out = cfg.channels * cfg.channels_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = CausalResnetBlockFactorized3d(
                    block_out, num_groups=1, dropout=cfg.dropout,
                    name=f"up_{i_level}_block_{i_block}")(h)
                # NOTE: attn_resolutions never matches at these sizes
                # (resolution=1024 config), mirroring the reference where only
                # the mid attn exists for the DV configs.
            if i_level != 0:
                # layer-index correspondence w/ encoder downsampling
                # (reference: layers3d.py:992-1008)
                i_level_reverse = num_resolutions - i_level - 1
                if cfg.legacy_mode:
                    temporal_up = i_level_reverse < num_temporal_ups
                else:
                    temporal_up = 0 < i_level_reverse < num_temporal_ups + 1
                spatial_up = temporal_up or (
                    i_level_reverse < num_spatial_ups
                    and num_spatial_ups > num_temporal_ups)
                h = CausalHybridUpsample3d(
                    spatial_up=spatial_up, temporal_up=temporal_up,
                    name=f"up_{i_level}_upsample")(h)

        h = CausalNormalize(1, name="norm_out")(h)
        h = nonlinearity(h)
        out_ch = cfg.out_channels * cfg.patch_size ** 3
        h = CausalConv3d(out_ch, (1, 3, 3), padding=1, name="conv_out_0")(h)
        h = CausalConv3d(out_ch, (3, 1, 1), padding=0, name="conv_out_1")(h)

        if cfg.patch_method == "haar":
            return unpatch3d_haar(h, cfg.patch_size)
        return unpatch3d_rearrange(h, cfg.patch_size)


class EncoderBase(nn.Module):
    """Non-factorized MagViT2 encoder: spatial 2D patcher, full 3x3x3 resnet
    blocks, strided spatio-temporal downsamples + final temporal avg-pool
    (reference: layers3d.py:476-601)."""
    cfg: DiscreteVideoConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        num_resolutions = len(cfg.channels_mult)
        ng = cfg.num_groups
        if cfg.patch_method == "haar":
            x = patch2d_haar(x, cfg.patch_size)
        else:
            x = patch2d_rearrange(x, cfg.patch_size)

        h = CausalConv3d(cfg.channels, (3, 3, 3), padding=1, name="conv_in")(x)
        curr_res = cfg.resolution // cfg.patch_size
        for i_level in range(num_resolutions):
            block_out = cfg.channels * cfg.channels_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = CausalResnetBlock3d(block_out, num_groups=ng,
                                        dropout=cfg.dropout,
                                        name=f"down_{i_level}_block_{i_block}")(h)
                if curr_res in cfg.attn_resolutions:
                    h = CausalAttnBlock(ng, name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_resolutions - 1:
                h = CausalDownsample3d(name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
            else:
                # final temporal avg-pool downsample (layers3d.py:578-589)
                time_factor = 2 if h.shape[1] > 1 else 1
                h = jnp.concatenate([h[:, :1], h], axis=1)
                h = nn.avg_pool(h, (time_factor, 1, 1), strides=(2, 1, 1),
                                padding="VALID")

        block_in = cfg.channels * cfg.channels_mult[-1]
        h = CausalResnetBlock3d(block_in, num_groups=ng, dropout=cfg.dropout,
                                name="mid_block_1")(h)
        h = CausalAttnBlock(ng, name="mid_attn_1")(h)
        h = CausalResnetBlock3d(block_in, num_groups=ng, dropout=cfg.dropout,
                                name="mid_block_2")(h)
        h = CausalNormalize(ng, name="norm_out")(h)
        h = nonlinearity(h)
        return CausalConv3d(cfg.z_factor * cfg.z_channels, (3, 3, 3),
                            padding=1, name="conv_out")(h)


class DecoderBase(nn.Module):
    """(reference: layers3d.py:604-728)"""
    cfg: DiscreteVideoConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        num_resolutions = len(cfg.channels_mult)
        ng = cfg.num_groups
        block_in = cfg.channels * cfg.channels_mult[-1]
        h = CausalConv3d(block_in, (3, 3, 3), padding=1, name="conv_in")(z)
        h = CausalResnetBlock3d(block_in, num_groups=ng, dropout=cfg.dropout,
                                name="mid_block_1")(h)
        h = CausalAttnBlock(ng, name="mid_attn_1")(h)
        h = CausalResnetBlock3d(block_in, num_groups=ng, dropout=cfg.dropout,
                                name="mid_block_2")(h)

        for i_level in reversed(range(num_resolutions)):
            block_out = cfg.channels * cfg.channels_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = CausalResnetBlock3d(block_out, num_groups=ng,
                                        dropout=cfg.dropout,
                                        name=f"up_{i_level}_block_{i_block}")(h)
            if i_level != 0:
                h = CausalUpsample3d(name=f"up_{i_level}_upsample")(h)
            else:
                # final temporal repeat upsample (layers3d.py:716-722)
                time_factor = 2 if h.shape[1] > 1 else 1
                h = jnp.repeat(h, time_factor, axis=1)[:, time_factor - 1:]

        h = CausalNormalize(ng, name="norm_out")(h)
        h = nonlinearity(h)
        out_ch = cfg.out_channels * cfg.patch_size ** 2
        h = CausalConv3d(out_ch, (3, 3, 3), padding=1, name="conv_out")(h)
        if cfg.patch_method == "haar":
            return unpatch2d_haar(h, cfg.patch_size)
        return unpatch2d_rearrange(h, cfg.patch_size)


class CausalDiscreteVideoTokenizer(nn.Module):
    """encoder -> quant_conv -> FSQ -> post_quant_conv -> decoder
    (reference: networks/discrete_video.py:33-145)."""
    cfg: DiscreteVideoConfig = DV4x8x8_CONFIG

    def setup(self):
        cfg = self.cfg
        enc_cls = {"FACTORIZED": EncoderFactorized, "BASE": EncoderBase}
        dec_cls = {"FACTORIZED": DecoderFactorized, "BASE": DecoderBase}
        self.encoder = enc_cls[cfg.encoder](cfg)
        self.decoder = dec_cls[cfg.decoder](cfg)
        self.quant_conv = CausalConv3d(cfg.embedding_dim, (1, 1, 1), padding=0)
        self.post_quant_conv = CausalConv3d(cfg.z_channels, (1, 1, 1), padding=0)
        self.quantizer = FSQ(cfg.levels)

    def encode(self, x):
        """x: (B, T, H, W, 3) in [-1, 1] -> (indices (B,t,h,w), codes (B,t,h,w,6))."""
        h = self.encoder(x)
        h = self.quant_conv(h)
        indices, codes = self.quantizer(h.astype(jnp.float32))
        return indices, codes

    def decode(self, codes):
        """codes: (B, t, h, w, 6) -> video (B, 1+(T-1)*pt, H, W, 3)."""
        h = self.post_quant_conv(codes)
        return self.decoder(h)

    def decode_code(self, indices):
        codes = self.quantizer.indices_to_codes(indices)
        return self.decode(codes)

    def __call__(self, x):
        indices, codes = self.encode(x)
        recon = self.decode(codes)
        return recon, indices


@dataclasses.dataclass(frozen=True)
class ContinuousVideoConfig(DiscreteVideoConfig):
    """CV tokenizer config (reference: networks/configs.py:100-121)."""
    latent_channels: int = 16
    formulation: str = "AE"  # or "VAE"
    spatial_compression: int = 8
    temporal_compression: int = 8


CV8x8x8_CONFIG = ContinuousVideoConfig()
CV4x8x8_CONFIG = ContinuousVideoConfig(temporal_compression=4)


class CausalContinuousVideoTokenizer(nn.Module):
    """AE/VAE causal video tokenizer (reference:
    networks/continuous_video.py:31-118).  Mirrors the reference's
    temporal_compression==4 quirk where only the *decoder* drops to
    channels_mult=[2, 4] (continuous_video.py:44-45)."""
    cfg: ContinuousVideoConfig = CV8x8x8_CONFIG

    def setup(self):
        from egom2p_tpu.tokenizers.cosmos.distributions import (
            gaussian_distribution, identity_distribution)
        cfg = self.cfg
        enc_cls = {"FACTORIZED": EncoderFactorized, "BASE": EncoderBase}
        dec_cls = {"FACTORIZED": DecoderFactorized, "BASE": DecoderBase}
        # encoder emits z_factor * z_channels (z_factor=2 for a VAE carries
        # mean+logvar); DiscreteVideoConfig.z_factor feeds the encoder conv_out
        self.encoder = enc_cls[cfg.encoder](cfg)
        dec_cfg = cfg
        if cfg.temporal_compression == 4:
            dec_cfg = dataclasses.replace(cfg, channels_mult=(2, 4))
        self.decoder = dec_cls[cfg.decoder](dec_cfg)
        self.quant_conv = CausalConv3d(cfg.z_factor * cfg.latent_channels,
                                       (1, 1, 1), padding=0)
        self.post_quant_conv = CausalConv3d(cfg.z_channels, (1, 1, 1),
                                            padding=0)
        self._gaussian = gaussian_distribution
        self._identity = identity_distribution

    def encode(self, x, rng=None):
        """x: (B, T, H, W, 3) in [-1, 1] -> (latent, (mean, logvar))."""
        h = self.encoder(x)
        moments = self.quant_conv(h)
        if self.cfg.formulation == "VAE":
            return self._gaussian(moments, rng)
        return self._identity(moments)

    def decode(self, z):
        h = self.post_quant_conv(z)
        return self.decoder(h)

    def __call__(self, x, rng=None):
        latent, posteriors = self.encode(x, rng)
        recon = self.decode(latent)
        return recon, posteriors, latent

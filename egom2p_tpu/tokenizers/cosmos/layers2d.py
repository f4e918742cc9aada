"""Cosmos 2D image-tokenizer layers in channels-last JAX.

Reimplements the stable-diffusion-style 2D Encoder/Decoder the reference uses
for its CI/DI image tokenizers (reference: cosmos_tokenizer/modules/
layers2d.py:39-368).  Layout is NHWC throughout so XLA keeps convs on the MXU
without transposes; attention runs as one batched einsum over h*w positions.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from egom2p_tpu.ops.wavelet import (patch2d_haar, patch2d_rearrange,
                                    unpatch2d_haar, unpatch2d_rearrange)
from egom2p_tpu.tokenizers.cosmos.layers import nonlinearity


class Normalize2d(nn.Module):
    """GroupNorm(32) as in the reference's `Normalize`
    (reference: modules/utils.py:61-64)."""
    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=1e-6,
                            dtype=jnp.float32, name="norm")(x).astype(x.dtype)


def _conv2d(features, kernel=3, stride=1, padding=1, name=None):
    pad = ((padding, padding), (padding, padding)) if padding else "VALID"
    return nn.Conv(features, kernel_size=(kernel, kernel),
                   strides=(stride, stride), padding=pad, name=name)


class Upsample2d(nn.Module):
    """Nearest 2x upsample + 3x3 conv (reference: layers2d.py:39-48)."""

    @nn.compact
    def __call__(self, x):
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return _conv2d(x.shape[-1], name="conv")(x)


class Downsample2d(nn.Module):
    """Right/bottom zero-pad + stride-2 3x3 conv (reference:
    layers2d.py:52-62)."""

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return _conv2d(x.shape[-1], stride=2, padding=0, name="conv")(x)


class ResnetBlock2d(nn.Module):
    """(reference: layers2d.py:65-106)."""
    out_channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        h = Normalize2d(name="norm1")(x)
        h = nonlinearity(h)
        h = _conv2d(self.out_channels, name="conv1")(h)
        h = Normalize2d(name="norm2")(h)
        h = nonlinearity(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = _conv2d(self.out_channels, name="conv2")(h)
        if x.shape[-1] != self.out_channels:
            x = _conv2d(self.out_channels, kernel=1, padding=0,
                        name="nin_shortcut")(x)
        return x + h


class AttnBlock2d(nn.Module):
    """Single-head full spatial attention over h*w positions
    (reference: layers2d.py:109-147)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hid = Normalize2d(name="norm")(x)
        q = _conv2d(c, kernel=1, padding=0, name="q")(hid).reshape(b, h * w, c)
        k = _conv2d(c, kernel=1, padding=0, name="k")(hid).reshape(b, h * w, c)
        v = _conv2d(c, kernel=1, padding=0, name="v")(hid).reshape(b, h * w, c)
        # fp32 accumulation INSIDE the einsum: casting afterwards cannot
        # recover precision once the scores were rounded to bf16
        attn = jnp.einsum("bqc,bkc->bqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (c ** -0.5), axis=-1).astype(x.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        return x + _conv2d(c, kernel=1, padding=0, name="proj_out")(out)


def _patch2d(x, patch_size, method):
    """4D NHWC wrapper over the shared 5D (B,T,H,W,C) patcher ops."""
    if patch_size == 1:
        return x
    fn = patch2d_haar if method == "haar" else patch2d_rearrange
    return fn(x[:, None], patch_size)[:, 0]


def _unpatch2d(x, patch_size, method):
    if patch_size == 1:
        return x
    fn = unpatch2d_haar if method == "haar" else unpatch2d_rearrange
    return fn(x[:, None], patch_size)[:, 0]


class Encoder2d(nn.Module):
    """2D encoder (reference: layers2d.py:150-255).  `cfg` is an
    ImageTokenizerConfig (network.py)."""
    cfg: "object"

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        cfg = self.cfg
        num_resolutions = len(cfg.channels_mult)
        num_downsamples = int(math.log2(cfg.spatial_compression)) - int(
            math.log2(cfg.patch_size))
        assert num_downsamples <= num_resolutions, (
            f"can only downsample {num_resolutions} times")

        x = _patch2d(x, cfg.patch_size, cfg.patch_method)
        h = _conv2d(cfg.channels, name="conv_in")(x)

        curr_res = cfg.resolution // cfg.patch_size
        for i_level in range(num_resolutions):
            block_out = cfg.channels * cfg.channels_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock2d(block_out, cfg.dropout,
                                  name=f"down_{i_level}_block_{i_block}")(
                                      h, deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock2d(name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level < num_downsamples:
                h = Downsample2d(name=f"down_{i_level}_downsample")(h)
                curr_res //= 2

        block_in = cfg.channels * cfg.channels_mult[-1]
        h = ResnetBlock2d(block_in, cfg.dropout, name="mid_block_1")(
            h, deterministic)
        h = AttnBlock2d(name="mid_attn_1")(h)
        h = ResnetBlock2d(block_in, cfg.dropout, name="mid_block_2")(
            h, deterministic)

        h = Normalize2d(name="norm_out")(h)
        h = nonlinearity(h)
        return _conv2d(cfg.z_factor * cfg.z_channels, name="conv_out")(h)


class Decoder2d(nn.Module):
    """2D decoder (reference: layers2d.py:258-368)."""
    cfg: "object"

    @nn.compact
    def __call__(self, z, deterministic: bool = True):
        cfg = self.cfg
        num_resolutions = len(cfg.channels_mult)
        num_upsamples = int(math.log2(cfg.spatial_compression)) - int(
            math.log2(cfg.patch_size))
        assert num_upsamples <= num_resolutions, (
            f"can only upsample {num_resolutions} times")

        block_in = cfg.channels * cfg.channels_mult[-1]
        curr_res = (cfg.resolution // cfg.patch_size) // 2 ** (
            num_resolutions - 1)

        h = _conv2d(block_in, name="conv_in")(z)
        h = ResnetBlock2d(block_in, cfg.dropout, name="mid_block_1")(
            h, deterministic)
        h = AttnBlock2d(name="mid_attn_1")(h)
        h = ResnetBlock2d(block_in, cfg.dropout, name="mid_block_2")(
            h, deterministic)

        for i_level in reversed(range(num_resolutions)):
            block_out = cfg.channels * cfg.channels_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock2d(block_out, cfg.dropout,
                                  name=f"up_{i_level}_block_{i_block}")(
                                      h, deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock2d(name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level >= (num_resolutions - num_upsamples):
                h = Upsample2d(name=f"up_{i_level}_upsample")(h)
                curr_res *= 2

        h = Normalize2d(name="norm_out")(h)
        h = nonlinearity(h)
        out_ch = cfg.out_channels * cfg.patch_size ** 2
        h = _conv2d(out_ch, name="conv_out")(h)
        return _unpatch2d(h, cfg.patch_size, cfg.patch_method)

"""Causal 3D CNN building blocks for the Cosmos video tokenizer, TPU-native.

Reimplements the MagViT2-style causal layers
(reference: cosmos_tokenizer/modules/layers3d.py) in channels-last
(B, T, H, W, C) layout with XLA convolutions:

  * CausalConv3d: left-replication temporal padding + constant spatial padding
    (reference: layers3d.py:54-101),
  * hybrid spatial/temporal down/upsampling with avg-pool residuals
    (reference: layers3d.py:144-260),
  * factorized resnet blocks with per-frame GroupNorm (num_groups=1 == causal
    LayerNorm over (H, W, C), reference: modules/utils.py:67-84),
  * spatial attention via time->batch folding and causal temporal attention
    via space->batch folding (reference: layers3d.py:375-473).

All parameters are fp32; compute dtype follows the input.
"""
from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def nonlinearity(x):
    return x * jax.nn.sigmoid(x)


class _Conv3dCore(nn.Module):
    """Tap-unrolled alternative to ``nn.Conv`` over (T, H, W) — A/B only.

    Same param tree (``kernel`` (kt, kh, kw, ci, co) + ``bias``) and VALID
    semantics, but never emits a 3-spatial-dim XLA convolution: the
    temporal taps are unrolled (kt is 1 or 3 everywhere in this network)
    into

      * kh == kw == 1: ONE matmul over stacked taps — (B,T,H,W, kt*ci) x
        (kt*ci, co) on the MXU,
      * otherwise: a sum of kt time-folded 2D NHWC convs.

    Built to chase a suspected 9%-MFU 3D-conv pathology that turned out
    to be a benchmark artifact (an un-warmed stage loop absorbing relay
    tail latency — see bench.py).  On-chip A/B at the real DV4x8x8
    encode, B=8 x 17x256x256 (2026-08-20, warm loops): XLA's native
    3D-conv path 38.6 ms (110 TF/s, 56% MFU — at its compute roofline),
    this decomposition 43.2 ms (101 TF/s).  Native wins; it stays the
    default and this core ships opt-in (EGOM2P_CONV3D_UNROLL=1) as the
    A/B reference, like the rejected fused flash64 backward."""
    features: int
    kernel_size: Tuple[int, int, int]
    strides: Tuple[int, int, int]
    dilation: Tuple[int, int, int]

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        ts, sh, sw = self.strides
        td, dh, dw = self.dilation
        ci = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (kt, kh, kw, ci, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        w = kernel.astype(x.dtype)
        t_in = x.shape[1]
        t_out = (t_in - (kt - 1) * td - 1) // ts + 1
        # temporal tap k of the output sees input frames k*td :: ts
        taps = [x[:, k * td:k * td + (t_out - 1) * ts + 1:ts]
                for k in range(kt)]
        if kh == 1 and kw == 1 and sh == 1 and sw == 1:
            xs = taps[0] if kt == 1 else jnp.concatenate(taps, axis=-1)
            y = jax.lax.dot_general(
                xs, w.reshape(kt * ci, self.features),
                (((xs.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            b, _, h, ww_, _ = x.shape
            y = None
            for k in range(kt):
                xb = taps[k].reshape(b * t_out, h, ww_, ci)
                yk = jax.lax.conv_general_dilated(
                    xb, w[k], window_strides=(sh, sw), padding="VALID",
                    rhs_dilation=(dh, dw),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=jnp.float32)
                y = yk if y is None else y + yk
            y = y.reshape(b, t_out, *y.shape[1:])
        return (y + bias).astype(x.dtype)


class CausalConv3d(nn.Module):
    """Conv3d with causal (left-replicated) temporal padding.

    `padding` is the symmetric spatial padding (constant/zero), matching the
    reference's semantics (reference: layers3d.py:54-101)."""
    features: int
    kernel_size: Tuple[int, int, int] = (3, 3, 3)
    stride: int = 1          # spatial stride
    time_stride: int = 1
    dilation: int = 1
    time_dilation: int = 1
    padding: int = 1         # spatial, per side

    @nn.compact
    def __call__(self, x):
        kt, kh, kw = self.kernel_size
        time_pad = self.time_dilation * (kt - 1) + (1 - self.time_stride)
        if time_pad > 0:
            first = jnp.repeat(x[:, :1], time_pad, axis=1)
            x = jnp.concatenate([first, x], axis=1)
        if self.padding > 0:
            p = self.padding
            x = jnp.pad(x, ((0, 0), (0, 0), (p, p), (p, p), (0, 0)))
        if os.environ.get("EGOM2P_CONV3D_UNROLL", "0") == "1":
            # A/B path; measured slower than XLA's native 3D conv (see
            # _Conv3dCore docstring), parameter-tree identical.
            return _Conv3dCore(
                self.features, kernel_size=(kt, kh, kw),
                strides=(self.time_stride, self.stride, self.stride),
                dilation=(self.time_dilation, self.dilation, self.dilation),
                name="conv3d")(x)
        return nn.Conv(
            self.features, kernel_size=(kt, kh, kw),
            strides=(self.time_stride, self.stride, self.stride),
            kernel_dilation=(self.time_dilation, self.dilation, self.dilation),
            padding="VALID", name="conv3d")(x)


class CausalNormalize(nn.Module):
    """GroupNorm; num_groups=1 is applied per-frame (time folded into batch)
    so causality holds (reference: modules/utils.py:67-84)."""
    num_groups: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xf = x.astype(jnp.float32)
        if self.num_groups == 1:
            # normalize over (H, W, C) per (b, t)
            mean = xf.mean(axis=(2, 3, 4), keepdims=True)
            var = jnp.square(xf - mean).mean(axis=(2, 3, 4), keepdims=True)
            y = (xf - mean) * jax.lax.rsqrt(var + 1e-6)
        else:
            b, t, h, w, _ = xf.shape
            g = self.num_groups
            xg = xf.reshape(b, t, h, w, g, c // g)
            mean = xg.mean(axis=(1, 2, 3, 5), keepdims=True)
            var = jnp.square(xg - mean).mean(axis=(1, 2, 3, 5), keepdims=True)
            y = ((xg - mean) * jax.lax.rsqrt(var + 1e-6)).reshape(xf.shape)
        return (y * scale + bias).astype(x.dtype)


def _avg_pool(x, window, strides):
    return nn.avg_pool(x, window_shape=window, strides=strides, padding="VALID")


class CausalHybridDownsample3d(nn.Module):
    """(reference: layers3d.py:203-260)"""
    spatial_down: bool = True
    temporal_down: bool = True

    @nn.compact
    def __call__(self, x):
        if not self.spatial_down and not self.temporal_down:
            return x
        c = x.shape[-1]
        if self.spatial_down:
            xp = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
            x1 = CausalConv3d(c, (1, 3, 3), stride=2, time_stride=1,
                              padding=0, name="conv1")(xp)
            x2 = _avg_pool(xp, (1, 2, 2), (1, 2, 2))
            x = x1 + x2
        if self.temporal_down:
            xp = jnp.concatenate([x[:, :1], x], axis=1)  # replication_pad
            x1 = CausalConv3d(c, (3, 1, 1), stride=1, time_stride=2,
                              padding=0, name="conv2")(xp)
            x2 = _avg_pool(xp, (2, 1, 1), (2, 1, 1))
            x = x1 + x2
        x = CausalConv3d(c, (1, 1, 1), stride=1, time_stride=1, padding=0,
                         name="conv3")(x)
        return x


class CausalHybridUpsample3d(nn.Module):
    """(reference: layers3d.py:144-200)"""
    spatial_up: bool = True
    temporal_up: bool = True

    @nn.compact
    def __call__(self, x):
        if not self.spatial_up and not self.temporal_up:
            return x
        c = x.shape[-1]
        if self.temporal_up:
            time_factor = 2 if x.shape[1] > 1 else 1
            x = jnp.repeat(x, time_factor, axis=1)
            x = x[:, time_factor - 1:]
            x = CausalConv3d(c, (3, 1, 1), stride=1, time_stride=1,
                             padding=0, name="conv1")(x) + x
        if self.spatial_up:
            x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
            x = CausalConv3d(c, (1, 3, 3), stride=1, time_stride=1,
                             padding=1, name="conv2")(x) + x
        x = CausalConv3d(c, (1, 1, 1), stride=1, time_stride=1, padding=0,
                         name="conv3")(x)
        return x


class CausalResnetBlockFactorized3d(nn.Module):
    """(reference: layers3d.py:306-372)"""
    out_channels: int
    num_groups: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_channels = x.shape[-1]
        h = CausalNormalize(1, name="norm1")(x)
        h = nonlinearity(h)
        h = CausalConv3d(self.out_channels, (1, 3, 3), padding=1,
                         name="conv1_0")(h)
        h = CausalConv3d(self.out_channels, (3, 1, 1), padding=0,
                         name="conv1_1")(h)
        h = CausalNormalize(self.num_groups, name="norm2")(h)
        h = nonlinearity(h)
        if self.dropout > 0 and not deterministic:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        h = CausalConv3d(self.out_channels, (1, 3, 3), padding=1,
                         name="conv2_0")(h)
        h = CausalConv3d(self.out_channels, (3, 1, 1), padding=0,
                         name="conv2_1")(h)
        if in_channels != self.out_channels:
            x = CausalConv3d(self.out_channels, (1, 1, 1), padding=0,
                             name="nin_shortcut")(x)
        return x + h


class CausalResnetBlock3d(nn.Module):
    """Non-factorized resnet block with full 3x3x3 causal convs
    (reference: layers3d.py:263-303)."""
    out_channels: int
    num_groups: int = 32
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        in_channels = x.shape[-1]
        h = CausalNormalize(self.num_groups, name="norm1")(x)
        h = nonlinearity(h)
        h = CausalConv3d(self.out_channels, (3, 3, 3), padding=1, name="conv1")(h)
        h = CausalNormalize(self.num_groups, name="norm2")(h)
        h = nonlinearity(h)
        if self.dropout > 0 and not deterministic:
            h = nn.Dropout(self.dropout, deterministic=False)(h)
        h = CausalConv3d(self.out_channels, (3, 3, 3), padding=1, name="conv2")(h)
        if in_channels != self.out_channels:
            x = CausalConv3d(self.out_channels, (1, 1, 1), padding=0,
                             name="nin_shortcut")(x)
        return x + h


class CausalDownsample3d(nn.Module):
    """Strided 3x3x3 causal conv downsample, spatial+temporal
    (reference: layers3d.py:124-141)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        x = jnp.concatenate([x[:, :1], x], axis=1)  # replication_pad
        return CausalConv3d(c, (3, 3, 3), stride=2, time_stride=2, padding=0,
                            name="conv")(x)


class CausalUpsample3d(nn.Module):
    """Nearest upsample + 3x3x3 causal conv (reference: layers3d.py:104-121)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        x = jnp.repeat(jnp.repeat(x, 2, axis=2), 2, axis=3)
        time_factor = 2 if x.shape[1] > 1 else 1
        x = jnp.repeat(x, time_factor, axis=1)
        x = CausalConv3d(c, (3, 3, 3), stride=1, padding=1, name="conv")(x)
        return x[:, time_factor - 1:]


class CausalAttnBlock(nn.Module):
    """Spatial self-attention per frame (time folded into batch)
    (reference: layers3d.py:375-421)."""
    num_groups: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = CausalNormalize(self.num_groups, name="norm")(x)
        q = CausalConv3d(c, (1, 1, 1), padding=0, name="q")(h)
        k = CausalConv3d(c, (1, 1, 1), padding=0, name="k")(h)
        v = CausalConv3d(c, (1, 1, 1), padding=0, name="v")(h)
        b, t, hh, ww, _ = q.shape
        qf = q.reshape(b * t, hh * ww, c)
        kf = k.reshape(b * t, hh * ww, c)
        vf = v.reshape(b * t, hh * ww, c)
        attn = jnp.einsum("bnc,bmc->bnm", qf, kf,
                          preferred_element_type=jnp.float32) * (c ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(vf.dtype)
        o = jnp.einsum("bnm,bmc->bnc", attn, vf).reshape(b, t, hh, ww, c)
        o = CausalConv3d(c, (1, 1, 1), padding=0, name="proj_out")(o)
        return x + o


class CausalTemporalAttnBlock(nn.Module):
    """Causal temporal self-attention per pixel (space folded into batch)
    (reference: layers3d.py:424-473)."""
    num_groups: int = 1

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        h = CausalNormalize(self.num_groups, name="norm")(x)
        q = CausalConv3d(c, (1, 1, 1), padding=0, name="q")(h)
        k = CausalConv3d(c, (1, 1, 1), padding=0, name="k")(h)
        v = CausalConv3d(c, (1, 1, 1), padding=0, name="v")(h)
        b, t, hh, ww, _ = q.shape

        def fold(a):
            return a.transpose(0, 2, 3, 1, 4).reshape(b * hh * ww, t, c)

        qf, kf, vf = fold(q), fold(k), fold(v)
        attn = jnp.einsum("bnc,bmc->bnm", qf, kf,
                          preferred_element_type=jnp.float32) * (c ** -0.5)
        causal = jnp.triu(jnp.ones((t, t), dtype=bool), 1)
        attn = jnp.where(causal[None], -1e30, attn)
        attn = jax.nn.softmax(attn, axis=-1).astype(vf.dtype)
        o = jnp.einsum("bnm,bmc->bnc", attn, vf)
        o = o.reshape(b, hh, ww, t, c).transpose(0, 3, 1, 2, 4)
        o = CausalConv3d(c, (1, 1, 1), padding=0, name="proj_out")(o)
        return x + o

"""3D Haar wavelet patching for the Cosmos video tokenizer.

Equivalent to Patcher3D / UnPatcher3D with patch_method='haar'
(reference: cosmos_tokenizer/modules/patching.py:112-356) but implemented with
pairwise reshape arithmetic instead of grouped transposed convolutions: for
even-length axes (always true here: inputs are padded to multiples of the
patch size), the reference's stride-2 Haar convs with sqrt(2)/2 kernels plus
the global 1/(2*sqrt(2)) rescale reduce exactly to
  l = (x0 + x1) / 2,  h = (x0 - x1) / 2        (forward, per axis)
  x0 = l + h,         x1 = l - h               (inverse, per axis)
applied along T, H, W in that order, with subband-major channel stacking
[8 subbands x C] matching the reference's torch.cat order (t, h, w fastest).

Layout is channels-last (B, T, H, W, C).
"""
from __future__ import annotations

import jax.numpy as jnp


def _axis_dwt(x: jnp.ndarray, axis: int):
    shape = list(x.shape)
    n = shape[axis]
    assert n % 2 == 0, f"axis {axis} length {n} must be even for Haar DWT"
    new_shape = shape[:axis] + [n // 2, 2] + shape[axis + 1:]
    xr = x.reshape(new_shape)
    x0 = jnp.take(xr, 0, axis=axis + 1)
    x1 = jnp.take(xr, 1, axis=axis + 1)
    return (x0 + x1) * 0.5, (x0 - x1) * 0.5


def _axis_idwt(l: jnp.ndarray, h: jnp.ndarray, axis: int):
    x0 = l + h
    x1 = l - h
    stacked = jnp.stack([x0, x1], axis=axis + 1)
    shape = list(l.shape)
    shape[axis] = shape[axis] * 2
    return stacked.reshape(shape)


def dwt3d(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, H, W, C) -> (B, T/2, H/2, W/2, 8*C), subband-major channels."""
    lt, ht = _axis_dwt(x, 1)
    bands = []
    for tb in (lt, ht):
        lh, hh = _axis_dwt(tb, 2)
        for hb in (lh, hh):
            lw, hw = _axis_dwt(hb, 3)
            bands.extend([lw, hw])
    return jnp.concatenate(bands, axis=-1)


def idwt3d(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of dwt3d."""
    c = x.shape[-1] // 8
    bands = [x[..., i * c:(i + 1) * c] for i in range(8)]
    t_parts = []
    for tb in range(2):
        h_parts = []
        for hb in range(2):
            lw = bands[tb * 4 + hb * 2 + 0]
            hw = bands[tb * 4 + hb * 2 + 1]
            h_parts.append(_axis_idwt(lw, hw, 3))
        t_parts.append(_axis_idwt(h_parts[0], h_parts[1], 2))
    return _axis_idwt(t_parts[0], t_parts[1], 1)


def patch3d_haar(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Causal 3D Haar patching: the first frame is repeated `patch_size` times
    so a 1+(T-1) causal clip maps to (T-1+patch)/patch latent frames
    (reference: patching.py:161-166)."""
    first = jnp.repeat(x[:, :1], patch_size, axis=1)
    x = jnp.concatenate([first, x[:, 1:]], axis=1)
    levels = int(patch_size).bit_length() - 1
    for _ in range(levels):
        x = dwt3d(x)
    return x


def unpatch3d_haar(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Inverse patching; drops the (patch_size - 1) repeated lead frames
    (reference: patching.py:341-345)."""
    levels = int(patch_size).bit_length() - 1
    for _ in range(levels):
        x = idwt3d(x)
    return x[:, patch_size - 1:]


def dwt2d(x: jnp.ndarray) -> jnp.ndarray:
    """Spatial-only Haar DWT (per frame): (B, T, H, W, C) ->
    (B, T, H/2, W/2, 4*C), subband-major [ll, lh, hl, hh]
    (reference Patcher applied through time2batch, patching.py:39-100)."""
    # reference 2D path convolves W first, then H, and cats W-major
    # [ll, lh, hl, hh] (patching.py:84-92); kernels compose to per-axis means
    lw, hw = _axis_dwt(x, 3)
    bands = []
    for wb in (lw, hw):
        lh_, hh_ = _axis_dwt(wb, 2)
        bands.extend([lh_, hh_])
    return jnp.concatenate(bands, axis=-1)


def idwt2d(x: jnp.ndarray) -> jnp.ndarray:
    c = x.shape[-1] // 4
    bands = [x[..., i * c:(i + 1) * c] for i in range(4)]
    w_parts = [_axis_idwt(bands[0], bands[1], 2),
               _axis_idwt(bands[2], bands[3], 2)]
    return _axis_idwt(w_parts[0], w_parts[1], 3)


def patch2d_haar(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Per-frame spatial Haar patching (EncoderBase's patcher,
    reference: layers3d.py:558-562)."""
    levels = int(patch_size).bit_length() - 1
    for _ in range(levels):
        x = dwt2d(x)
    return x


def unpatch2d_haar(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    levels = int(patch_size).bit_length() - 1
    for _ in range(levels):
        x = idwt2d(x)
    return x


def patch2d_rearrange(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """Per-frame space-to-depth (reference: patching.py:102-109)."""
    b, t, h, w, c = x.shape
    p = patch_size
    x = x.reshape(b, t, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 2, 4, 6, 3, 5)
    return x.reshape(b, t, h // p, w // p, c * p * p)


def unpatch2d_rearrange(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    b, t, h, w, cp = x.shape
    p = patch_size
    c = cp // (p * p)
    x = x.reshape(b, t, h, w, c, p, p)
    x = x.transpose(0, 1, 2, 5, 3, 6, 4)
    return x.reshape(b, t, h * p, w * p, c)


def patch3d_rearrange(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    """patch_method='rearrange' variant (reference: patching.py:168-178)."""
    first = jnp.repeat(x[:, :1], patch_size, axis=1)
    x = jnp.concatenate([first, x[:, 1:]], axis=1)
    b, t, h, w, c = x.shape
    p = patch_size
    x = x.reshape(b, t // p, p, h // p, p, w // p, p, c)
    # 'b (t p1) (h p2) (w p3) c -> b t h w (c p1 p2 p3)'
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)
    return x.reshape(b, t // p, h // p, w // p, c * p * p * p)


def unpatch3d_rearrange(x: jnp.ndarray, patch_size: int) -> jnp.ndarray:
    b, t, h, w, cp = x.shape
    p = patch_size
    c = cp // (p * p * p)
    x = x.reshape(b, t, h, w, c, p, p, p)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    x = x.reshape(b, t * p, h * p, w * p, c)
    return x[:, patch_size - 1:]

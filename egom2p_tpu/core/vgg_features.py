"""Minimal VGG16 conv-feature extractor for LPIPS (channels-last).

Weight format: a dict with keys `conv{i}_w` (kh, kw, cin, cout) and
`conv{i}_b` for i in 0..12 (the 13 VGG16 conv layers), e.g. converted from
torchvision's vgg16 with a transpose of the conv kernels.  Taps after
relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3 — the five LPIPS layers
(Zhang et al. 2018).

Inputs are expected in [-1, 1]; the standard LPIPS shift/scale normalization
is applied internally.
"""
from __future__ import annotations

from typing import Dict, List

import numpy as np

# conv layers per VGG16 block; taps at each block end
_BLOCKS = (2, 2, 3, 3, 3)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _prep(x):
    # video (B, T, H, W, C) -> fold time into batch
    if x.ndim == 5:
        x = x.reshape(-1, *x.shape[2:])
    if x.shape[-1] == 1:  # depth -> replicate to 3 channels
        x = np.repeat(x, 3, axis=-1) if isinstance(x, np.ndarray) else x.repeat(3, axis=-1)
    return x


def vgg16_features(x: np.ndarray, weights: Dict[str, np.ndarray]
                   ) -> List[np.ndarray]:
    """Numpy reference implementation (small inputs / tests)."""
    import jax.numpy as jnp
    return [np.asarray(f) for f in vgg16_features_jax(jnp.asarray(x), weights)]


def vgg16_features_jax(x, weights: Dict[str, np.ndarray]) -> List:
    """JAX implementation, jit-safe; returns the 5 tap features (B,H,W,C)."""
    import jax
    import jax.numpy as jnp

    x = _prep(x)
    x = (x - jnp.asarray(_SHIFT)) / jnp.asarray(_SCALE)
    feats = []
    i = 0
    for b, n_convs in enumerate(_BLOCKS):
        for _ in range(n_convs):
            w = jnp.asarray(weights[f"conv{i}_w"])
            bias = jnp.asarray(weights[f"conv{i}_b"])
            x = jax.lax.conv_general_dilated(
                x, w, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jax.nn.relu(x + bias)
            i += 1
        feats.append(x)
        if b < len(_BLOCKS) - 1:
            x = jax.lax.reduce_window(x, -jnp.inf, jax.lax.max,
                                      (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    return feats

"""InceptionV3 feature/classifier graph for FID and InceptionScore.

The reference computes FID / InceptionScore with torchmetrics
(reference: run_training_vqvae.py:1563-1586, feature=2048 pool3 features
and `logits_unbiased`), whose backbone is pytorch-fid's *modified*
InceptionV3 (`NoTrainInceptionV3` / `pt_inception-2015-12-05` weights,
1008-class fc): border average pools divide by the valid count
(count_include_pad=False) and Mixed_7c's branch_pool is a MAX pool — the
TF-inception quirks FID is defined against.  This module implements both
variants in jit-safe JAX (channels-last), auto-selected by the fc width:

  * variant "fid" (fc rows == 1008): pytorch-fid semantics — input in
    [0, 1] is scaled to 2x-1, exclude-pad avg pools, max pool in Mixed_7c.
    Use a converted pt_inception checkpoint to match torchmetrics numbers.
  * variant "torchvision" (fc rows == 1000): stock torchvision graph —
    ImageNet mean/std normalization, include-pad avg pools everywhere.

  weights file: ckpt/inception_v3.npz — flat dict of the state-dict
  arrays under their original names (identical in both checkpoints, e.g.
  `Mixed_5b.branch1x1.conv.weight`, `...bn.running_mean`, `fc.weight`).
  `convert_inception_pth` below produces it from a local .pth
  (zero-egress: the file must be brought in by the user).

Structure (aux head unused at eval):
  stem: 5 BasicConv2d (conv->BN(eps 1e-3)->relu) + 2 maxpools
  Mixed_5b/5c/5d  (InceptionA, pool_features 32/64/64)
  Mixed_6a        (InceptionB)
  Mixed_6b..6e    (InceptionC, 7x1/1x7 factorized, c7 = 128/160/160/192)
  Mixed_7a        (InceptionD)
  Mixed_7b/7c     (InceptionE)
  global avgpool -> 2048 features -> fc

Inputs: (B, H, W, 3) in [0, 1] (torchmetrics `normalize=True` convention);
resized to 299x299 bilinear internally.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _conv_bn(x, w: Dict, name: str, stride: int = 1, padding="SAME"):
    """BasicConv2d: conv(no bias) -> BN(eps 1e-3, inference) -> relu."""
    import jax
    import jax.numpy as jnp

    kern = jnp.asarray(w[f"{name}.conv.weight"]).transpose(2, 3, 1, 0)
    x = jax.lax.conv_general_dilated(
        x, kern, window_strides=(stride, stride), padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    gamma = jnp.asarray(w[f"{name}.bn.weight"])
    beta = jnp.asarray(w[f"{name}.bn.bias"])
    mean = jnp.asarray(w[f"{name}.bn.running_mean"])
    var = jnp.asarray(w[f"{name}.bn.running_var"])
    x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * gamma + beta
    return jax.nn.relu(x)


def _maxpool(x, window: int = 3, stride: int = 2, padding="VALID"):
    import jax
    import jax.numpy as jnp
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), padding)


def _avgpool3(x, exclude_pad: bool):
    """3x3 stride-1 SAME average pool.  exclude_pad divides border windows
    by the valid count (pytorch-fid's count_include_pad=False patch);
    otherwise divide by 9 like stock torch AvgPool2d."""
    import jax
    import jax.numpy as jnp
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 1, 1, 1), "SAME")
    if not exclude_pad:
        return s / 9.0
    ones = jnp.ones((1, x.shape[1], x.shape[2], 1), x.dtype)
    count = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                  (1, 1, 1, 1), "SAME")
    return s / count


def _cat(*xs):
    import jax.numpy as jnp
    return jnp.concatenate(xs, axis=-1)


def _inception_a(x, w, name, ep):
    b1 = _conv_bn(x, w, f"{name}.branch1x1")
    b5 = _conv_bn(x, w, f"{name}.branch5x5_1")
    b5 = _conv_bn(b5, w, f"{name}.branch5x5_2")
    b3 = _conv_bn(x, w, f"{name}.branch3x3dbl_1")
    b3 = _conv_bn(b3, w, f"{name}.branch3x3dbl_2")
    b3 = _conv_bn(b3, w, f"{name}.branch3x3dbl_3")
    bp = _conv_bn(_avgpool3(x, ep), w, f"{name}.branch_pool")
    return _cat(b1, b5, b3, bp)


def _inception_b(x, w, name):
    b3 = _conv_bn(x, w, f"{name}.branch3x3", stride=2, padding="VALID")
    bd = _conv_bn(x, w, f"{name}.branch3x3dbl_1")
    bd = _conv_bn(bd, w, f"{name}.branch3x3dbl_2")
    bd = _conv_bn(bd, w, f"{name}.branch3x3dbl_3", stride=2, padding="VALID")
    return _cat(b3, bd, _maxpool(x))


def _inception_c(x, w, name, ep):
    b1 = _conv_bn(x, w, f"{name}.branch1x1")
    b7 = _conv_bn(x, w, f"{name}.branch7x7_1")
    b7 = _conv_bn(b7, w, f"{name}.branch7x7_2")
    b7 = _conv_bn(b7, w, f"{name}.branch7x7_3")
    bd = _conv_bn(x, w, f"{name}.branch7x7dbl_1")
    bd = _conv_bn(bd, w, f"{name}.branch7x7dbl_2")
    bd = _conv_bn(bd, w, f"{name}.branch7x7dbl_3")
    bd = _conv_bn(bd, w, f"{name}.branch7x7dbl_4")
    bd = _conv_bn(bd, w, f"{name}.branch7x7dbl_5")
    bp = _conv_bn(_avgpool3(x, ep), w, f"{name}.branch_pool")
    return _cat(b1, b7, bd, bp)


def _inception_d(x, w, name):
    b3 = _conv_bn(x, w, f"{name}.branch3x3_1")
    b3 = _conv_bn(b3, w, f"{name}.branch3x3_2", stride=2, padding="VALID")
    b7 = _conv_bn(x, w, f"{name}.branch7x7x3_1")
    b7 = _conv_bn(b7, w, f"{name}.branch7x7x3_2")
    b7 = _conv_bn(b7, w, f"{name}.branch7x7x3_3")
    b7 = _conv_bn(b7, w, f"{name}.branch7x7x3_4", stride=2, padding="VALID")
    return _cat(b3, b7, _maxpool(x))


def _inception_e(x, w, name, ep, max_pool=False):
    b1 = _conv_bn(x, w, f"{name}.branch1x1")
    b3 = _conv_bn(x, w, f"{name}.branch3x3_1")
    b3 = _cat(_conv_bn(b3, w, f"{name}.branch3x3_2a"),
              _conv_bn(b3, w, f"{name}.branch3x3_2b"))
    bd = _conv_bn(x, w, f"{name}.branch3x3dbl_1")
    bd = _conv_bn(bd, w, f"{name}.branch3x3dbl_2")
    bd = _cat(_conv_bn(bd, w, f"{name}.branch3x3dbl_3a"),
              _conv_bn(bd, w, f"{name}.branch3x3dbl_3b"))
    # pytorch-fid's FIDInceptionE_2 (Mixed_7c) uses a MAX branch pool
    pooled = (_maxpool(x, 3, 1, "SAME") if max_pool else _avgpool3(x, ep))
    bp = _conv_bn(pooled, w, f"{name}.branch_pool")
    return _cat(b1, b3, bd, bp)


def detect_variant(w: Dict[str, np.ndarray]) -> str:
    """'fid' for pt_inception checkpoints (1008-class fc), else
    'torchvision'."""
    return "fid" if np.asarray(w["fc.weight"]).shape[0] == 1008 \
        else "torchvision"


def inception_v3_forward(x, w: Dict[str, np.ndarray],
                         variant: str = None) -> Tuple:
    """(B, H, W, 3) in [0, 1] -> (pool3 features (B, 2048), logits (B, N)).

    jit-safe; resizes to 299 bilinear internally.  `variant` selects the
    pytorch-fid ('fid') or stock torchvision graph semantics (see module
    docstring); auto-detected from the fc width when None."""
    import jax
    import jax.numpy as jnp

    variant = variant or detect_variant(w)
    ep = variant == "fid"  # exclude-pad avg pools

    x = x.astype(jnp.float32)
    if x.shape[1] != 299 or x.shape[2] != 299:
        x = jax.image.resize(x, (x.shape[0], 299, 299, x.shape[-1]),
                             method="bilinear")
    if x.shape[-1] == 1:
        x = jnp.repeat(x, 3, axis=-1)
    if ep:  # pytorch-fid normalize_input: [0,1] -> [-1,1]
        x = x * 2.0 - 1.0
    else:   # torchvision eval transform
        x = (x - jnp.asarray(_IMAGENET_MEAN)) / jnp.asarray(_IMAGENET_STD)

    x = _conv_bn(x, w, "Conv2d_1a_3x3", stride=2, padding="VALID")
    x = _conv_bn(x, w, "Conv2d_2a_3x3", padding="VALID")
    x = _conv_bn(x, w, "Conv2d_2b_3x3")
    x = _maxpool(x)
    x = _conv_bn(x, w, "Conv2d_3b_1x1")
    x = _conv_bn(x, w, "Conv2d_4a_3x3", padding="VALID")
    x = _maxpool(x)
    x = _inception_a(x, w, "Mixed_5b", ep)
    x = _inception_a(x, w, "Mixed_5c", ep)
    x = _inception_a(x, w, "Mixed_5d", ep)
    x = _inception_b(x, w, "Mixed_6a")
    x = _inception_c(x, w, "Mixed_6b", ep)
    x = _inception_c(x, w, "Mixed_6c", ep)
    x = _inception_c(x, w, "Mixed_6d", ep)
    x = _inception_c(x, w, "Mixed_6e", ep)
    x = _inception_d(x, w, "Mixed_7a")
    x = _inception_e(x, w, "Mixed_7b", ep)
    x = _inception_e(x, w, "Mixed_7c", ep, max_pool=ep)
    feats = x.mean(axis=(1, 2))  # adaptive avgpool -> (B, 2048)
    logits = feats @ jnp.asarray(w["fc.weight"]).T + jnp.asarray(w["fc.bias"])
    return feats, logits


def make_inception_fns(weights: Dict[str, np.ndarray], batch: int = 32):
    """(feature_fn, probs_fn, run) over host numpy arrays, jitted + batched.

    feature_fn: images (N, H, W, C) in [0,1] -> (N, 2048) pool3 features
    probs_fn:   images -> (N, n_classes) softmax class probabilities
    run:        images -> (features, probs) in ONE forward — use it when a
                caller needs both (FID + InceptionScore share the net)"""
    import jax
    import jax.numpy as jnp

    variant = detect_variant(weights)
    fwd = jax.jit(lambda x: inception_v3_forward(x, weights, variant))

    def run(images):
        fs, ls = [], []
        for i in range(0, len(images), batch):
            f, l = fwd(jnp.asarray(images[i:i + batch]))
            fs.append(np.asarray(f))
            ls.append(np.asarray(jax.nn.softmax(l, axis=-1)))
        return np.concatenate(fs), np.concatenate(ls)

    return (lambda imgs: run(imgs)[0]), (lambda imgs: run(imgs)[1]), run


def convert_inception_pth(path: str, out_path: str) -> str:
    """Convert a local torchvision inception_v3 checkpoint (.pth state dict)
    to the flat .npz this module loads.  Aux-classifier keys are dropped;
    conv kernels stay in torch (O, I, kh, kw) layout (transposed at load)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = sd.get("state_dict", sd.get("model", sd))
    out = {k: v.detach().numpy() for k, v in sd.items()
           if not k.startswith("AuxLogits") and "num_batches" not in k}
    np.savez(out_path, **out)
    return out_path

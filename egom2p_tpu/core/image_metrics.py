"""Perceptual / distribution image metrics for tokenizer evaluation.

Reimplements the reference's torchmetrics suite — MS-SSIM, FID,
InceptionScore, LPIPS (reference: run_training_vqvae.py:49-53, 1507-1757) —
for the TPU stack:

  * MS-SSIM is pure math (numpy), exactly the Wang et al. 2003 formulation.
  * FID is the Frechet distance between Gaussian fits of feature sets; the
    feature extractor is PLUGGABLE.  The canonical InceptionV3-pool3 features
    require pretrained weights, which this zero-egress environment cannot
    download — pass `feature_fn`, or drop a feature-extractor checkpoint at
    ckpt/inception_v3.npz (dict of arrays for JaxInceptionFeatures) to match
    torchmetrics numbers.  The Frechet math itself is exact and unit-tested
    against closed-form Gaussians.
  * InceptionScore is computed from any class-probability matrix
    (`inception_score_from_probs`); the canonical probs come from the same
    InceptionV3 dependency.
  * LPIPS: normalized multi-layer feature distances with per-layer linear
    weights (Zhang et al. 2018).  `lpips_from_features` implements the
    distance; `make_lpips` builds the full metric from a conv feature
    extractor + linear weights loaded from ckpt/lpips_vgg.npz when present.

Every metric that needs pretrained weights raises a clear error when they are
absent rather than silently computing nonsense.
"""
from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from egom2p_tpu.core.metrics import ssim_components as _ssim_components

# ---------------------------------------------------------------- MS-SSIM
_MSSSIM_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _downsample2(x: np.ndarray) -> np.ndarray:
    h, w = x.shape
    x = x[: h - h % 2, : w - w % 2]
    return 0.25 * (x[0::2, 0::2] + x[1::2, 0::2] + x[0::2, 1::2]
                   + x[1::2, 1::2])


def ms_ssim(pred, target, data_range: float = 2.0,
            weights: Sequence[float] = _MSSSIM_WEIGHTS) -> float:
    """Multi-scale SSIM (Wang et al. 2003), averaged over batch/frames/channels.
    pred/target: (..., H, W) or (..., H, W, C) in [-1, 1] by default."""
    p = np.asarray(pred, dtype=np.float64)
    t = np.asarray(target, dtype=np.float64)
    if p.shape[-1] in (1, 3):
        p = np.moveaxis(p, -1, 0)
        t = np.moveaxis(t, -1, 0)
    p = p.reshape(-1, *p.shape[-2:])
    t = t.reshape(-1, *t.shape[-2:])
    n_scales = len(weights)
    min_side = min(p.shape[-2:])
    assert min_side >= 11 * 2 ** (n_scales - 1), (
        f"image side {min_side} too small for {n_scales}-scale MS-SSIM")
    vals = []
    for a, b in zip(p, t):
        mcs: List[float] = []
        ssim_last = 0.0
        for s in range(n_scales):
            ssim_last, cs = _ssim_components(a, b, data_range)
            mcs.append(cs)
            if s < n_scales - 1:
                a, b = _downsample2(a), _downsample2(b)
        terms = np.clip(np.array(mcs[:-1] + [ssim_last]), 1e-8, None)
        vals.append(np.prod(terms ** np.asarray(weights)))
    return float(np.mean(vals))


# --------------------------------------------------------------------- FID
def frechet_distance(mu1, sigma1, mu2, sigma2) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)) — exact Frechet/Wasserstein-2
    distance between Gaussians (the FID formula)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        # standard eps*I stabilization: rank-deficient covariances (few
        # samples vs feature dim) make sqrtm blow up
        eps = 1e-6
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2)
                 - 2 * np.trace(covmean))


def fid_from_features(feats_real: np.ndarray, feats_fake: np.ndarray) -> float:
    """FID given (N, D) feature matrices from any extractor."""
    fr = np.asarray(feats_real, dtype=np.float64)
    ff = np.asarray(feats_fake, dtype=np.float64)
    mu1, s1 = fr.mean(0), np.cov(fr, rowvar=False)
    mu2, s2 = ff.mean(0), np.cov(ff, rowvar=False)
    return frechet_distance(mu1, s1, mu2, s2)


class FIDAccumulator:
    """Streaming mean/cov accumulation per split, torchmetrics-style
    (reference: run_training_vqvae.py:1546-1573 uses torchmetrics FID)."""

    def __init__(self, feature_fn: Callable[[np.ndarray], np.ndarray]):
        self.feature_fn = feature_fn
        self.real: List[np.ndarray] = []
        self.fake: List[np.ndarray] = []

    def update(self, images: np.ndarray, real: bool):
        feats = np.asarray(self.feature_fn(images))
        (self.real if real else self.fake).append(feats)

    def compute(self) -> float:
        return fid_from_features(np.concatenate(self.real),
                                 np.concatenate(self.fake))


# --------------------------------------------------------- Inception Score
def inception_score_from_probs(probs: np.ndarray, splits: int = 10) -> float:
    """IS = exp(E_x KL(p(y|x) || p(y))), averaged over `splits` chunks.
    probs: (N, n_classes) class probabilities from any classifier."""
    p = np.asarray(probs, dtype=np.float64)
    p = p / p.sum(axis=1, keepdims=True)
    scores = []
    for chunk in np.array_split(p, splits):
        if len(chunk) == 0:
            continue
        marginal = chunk.mean(axis=0, keepdims=True)
        kl = (chunk * (np.log(chunk + 1e-12) - np.log(marginal + 1e-12))).sum(1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores))


# ------------------------------------------------------------------- LPIPS
def lpips_from_features(feats_a: Sequence[np.ndarray],
                        feats_b: Sequence[np.ndarray],
                        lin_weights: Optional[Sequence[np.ndarray]] = None
                        ) -> float:
    """LPIPS distance given per-layer conv features (B, H, W, C):
    unit-normalize channels, squared difference, 1x1 linear weighting
    (uniform if lin_weights is None), spatial average, sum over layers
    (Zhang et al. 2018 eq. 1)."""
    total = None
    for i, (fa, fb) in enumerate(zip(feats_a, feats_b)):
        fa = np.asarray(fa, dtype=np.float64)
        fb = np.asarray(fb, dtype=np.float64)
        na = fa / (np.linalg.norm(fa, axis=-1, keepdims=True) + 1e-10)
        nb = fb / (np.linalg.norm(fb, axis=-1, keepdims=True) + 1e-10)
        d2 = (na - nb) ** 2  # (B, H, W, C)
        w = (np.asarray(lin_weights[i], dtype=np.float64)
             if lin_weights is not None else
             np.full(d2.shape[-1], 1.0 / d2.shape[-1]))
        layer = (d2 * w).sum(-1).mean(axis=(1, 2))  # (B,)
        total = layer if total is None else total + layer
    return float(np.mean(total))


# ------------------------------------------- pretrained-backbone plumbing
_CKPT_DIR = os.environ.get("EGOM2P_CKPT_DIR", "./ckpt")


class MissingPretrainedWeights(RuntimeError):
    pass


def _require_weights(path: str, what: str) -> str:
    full = path if os.path.isabs(path) else os.path.join(_CKPT_DIR, path)
    if not os.path.exists(full):
        raise MissingPretrainedWeights(
            f"{what} needs pretrained weights at {full}. This environment "
            f"has no network egress; place the converted .npz there (see "
            f"egom2p_tpu/core/image_metrics.py docstring). The metric math "
            f"itself is unit-tested with synthetic features.")
    return full


def make_lpips(kind: str = "vgg") -> Callable[[np.ndarray, np.ndarray], float]:
    """Full LPIPS metric: VGG16 conv features + learned linear weights.
    Requires ckpt/lpips_vgg.npz with keys conv{i}_{w,b} and lin{i}."""
    path = _require_weights(f"lpips_{kind}.npz", "LPIPS")
    wts = dict(np.load(path))
    from egom2p_tpu.core.vgg_features import vgg16_features

    lins = [wts[k] for k in sorted(wts) if k.startswith("lin")]

    def metric(pred: np.ndarray, target: np.ndarray) -> float:
        fa = vgg16_features(pred, wts)
        fb = vgg16_features(target, wts)
        return lpips_from_features(fa, fb, lins)

    return metric


_INCEPTION_CACHE: Dict = {}


def get_inception_fns():
    """(feature_fn, probs_fn, run) from ckpt/inception_v3.npz, cached so the
    weights load and the XLA compile happen once per process."""
    path = _require_weights("inception_v3.npz",
                            "InceptionV3 (FID pool3 / InceptionScore)")
    key = (os.path.abspath(path), os.path.getmtime(path))
    if key not in _INCEPTION_CACHE:
        from egom2p_tpu.core.inception_v3 import make_inception_fns
        _INCEPTION_CACHE.clear()
        _INCEPTION_CACHE[key] = make_inception_fns(dict(np.load(path)))
    return _INCEPTION_CACHE[key]


_LPIPS_CACHE: Dict = {}


def get_lpips() -> Callable[[np.ndarray, np.ndarray], float]:
    """Cached LPIPS metric — the VGG weight file loads once per process
    instead of on every invocation."""
    path = _require_weights("lpips_vgg.npz", "LPIPS")
    key = (os.path.abspath(path), os.path.getmtime(path))
    if key not in _LPIPS_CACHE:
        _LPIPS_CACHE.clear()
        _LPIPS_CACHE[key] = make_lpips()
    return _LPIPS_CACHE[key]


def make_fid(feature_fn: Optional[Callable] = None) -> FIDAccumulator:
    """FID accumulator; the default extractor is the JAX InceptionV3 pool3
    graph fed from ckpt/inception_v3.npz (core/inception_v3.py)."""
    if feature_fn is None:
        feature_fn = get_inception_fns()[0]
    return FIDAccumulator(feature_fn)


def make_inception_score(probs_fn: Optional[Callable] = None,
                         splits: int = 10) -> Callable[[np.ndarray], float]:
    """InceptionScore over generated images in [0,1] (reference:
    run_training_vqvae.py:1574-1586, torchmetrics InceptionScore)."""
    if probs_fn is None:
        probs_fn = get_inception_fns()[1]
    return lambda images: inception_score_from_probs(probs_fn(images),
                                                     splits=splits)


def make_perceptual_loss(kind: str = "lpips"):
    """Trainer hook (reference: run_training_vqvae.py:560-576).  Returns a
    jittable callable(pred, target) -> scalar loss."""
    if kind != "lpips":
        raise ValueError(f"unsupported percept_loss_type {kind}")
    path = _require_weights("lpips_vgg.npz", "perceptual loss (LPIPS)")
    wts = {k: np.asarray(v) for k, v in np.load(path).items()}
    import jax.numpy as jnp
    from egom2p_tpu.core.vgg_features import vgg16_features_jax

    lins = [jnp.asarray(wts[k]) for k in sorted(wts) if k.startswith("lin")]

    def loss(pred, target):
        fa = vgg16_features_jax(pred, wts)
        fb = vgg16_features_jax(target, wts)
        total = 0.0
        for i, (a, b) in enumerate(zip(fa, fb)):
            na = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            nb = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            total = total + ((na - nb) ** 2 * lins[i]).sum(-1).mean()
        return total

    return loss


def register_default_perceptual_metrics() -> Dict[str, object]:
    """Populate egom2p_tpu.core.metrics.PERCEPTUAL_METRICS with the suite.
    Weight-free metrics are always live; weight-dependent ones raise
    MissingPretrainedWeights with instructions when invoked without their
    checkpoint."""
    from egom2p_tpu.core import metrics as m

    m.PERCEPTUAL_METRICS.update({
        "ms_ssim": ms_ssim,
        "fid_from_features": fid_from_features,
        "inception_score_from_probs": inception_score_from_probs,
        "lpips_from_features": lpips_from_features,
        "lpips": lambda p, t: get_lpips()(p, t),
    })
    return m.PERCEPTUAL_METRICS


register_default_perceptual_metrics()

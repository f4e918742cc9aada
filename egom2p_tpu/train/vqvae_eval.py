"""In-training evaluation suite for VQ-VAE tokenizer training.

TPU-native port of the reference's torchmetrics evaluation
(reference: run_training_vqvae.py:1421-1757 — `evaluate` loss eval +
`eval_metrics` image/trajectory metric suite, and the `eval_during_training`
launcher at :1296-1419 that also evaluates the EMA model):

  * `evaluate_loss` — reconstruction + codebook loss on an eval set
    (reference `evaluate`, :1421-1504).
  * `eval_metrics` — per-domain metric suite (reference :1507-1757):
      rgb:   MSE / MAE / PSNR / MS-SSIM per frame in [0,1]; FID / LPIPS /
             InceptionScore when their pretrained-weight checkpoints are
             present (zero-egress: see core/image_metrics.py docstring)
      depth: MSE / MAE / PSNR on the standardized channel
      cam:   MSE, MAE-transl, PSNR, geodesic rotation error in degrees on
             denormalized 9D trajectories (reference :1653-1663)
      gaze:  mask-selected MSE / MAE / PSNR on denormalized coordinates
             (reference :1664-1672)
    plus windowed codebook usage over all eval tokens (reference :1711-1719,
    window = 256 samples' worth of tokens, vq_utils.py:18-46).

Metrics are averaged over processes with `all_reduce_metrics` (the analog of
torchmetrics `sync_on_compute=True`).
"""
from __future__ import annotations

from typing import Dict, Iterable, Optional

import numpy as np

from egom2p_tpu.core import metrics as M


def _batches_of(data, batch_size: int, limit: Optional[int] = None):
    """Yield numpy batches from an (N, ...) array or an indexable dataset."""
    n = len(data)
    if limit is not None:
        n = min(n, limit)
    if isinstance(data, np.ndarray):
        for i in range(0, n, batch_size):
            yield data[i:i + batch_size]
        return
    for i in range(0, n, batch_size):
        yield np.stack([data[j] for j in range(i, min(i + batch_size, n))])


def _autoencode_and_tokens(tok, batch: np.ndarray):
    """Reconstruction + token indices under the tokenizer's current params."""
    import jax

    rec = np.asarray(jax.device_get(tok.autoencode(batch)))
    tokens = np.asarray(jax.device_get(tok.tokenize(batch)))
    return rec, tokens


def evaluate_loss(tok, data, loss_fn: str, codebook_weight: float,
                  batch_size: int, n_channels: int,
                  limit: Optional[int] = None, mesh=None) -> Dict[str, float]:
    """Mean eval losses, matching the train-step loss decomposition
    (reference `evaluate`, run_training_vqvae.py:1421-1504)."""
    from egom2p_tpu.core.distributed import all_reduce_metrics
    from egom2p_tpu.train.vqvae_train import reconst_loss

    totals = {"eval_loss": 0.0, "eval_reconst_loss": 0.0}
    count = 0
    for batch in _batches_of(data, batch_size, limit):
        rec, _ = _autoencode_and_tokens(tok, batch)
        r = float(reconst_loss(rec, batch, loss_fn, n_channels))
        totals["eval_reconst_loss"] += r * len(batch)
        totals["eval_loss"] += r * len(batch)  # codebook commit term is a
        count += len(batch)                    # train-only loss; eval tracks
                                               # reconstruction (ref :1469)
    if count == 0:
        return {}
    out = {k: v / count for k, v in totals.items()}
    return all_reduce_metrics(out, mesh=mesh)


def eval_metrics(tok, data, domain: str, codebook_size: int,
                 batch_size: int, limit: Optional[int] = None,
                 mesh=None, no_inception: bool = False) -> Dict[str, float]:
    """Full per-domain metric suite (reference: run_training_vqvae.py:1507-1757).

    `tok` is any tokenizer object with `.autoencode(x)` / `.tokenize(x)`;
    set `.params` (and `.vq_state`) to the weights under evaluation first —
    the EMA model is evaluated by passing EMA params the same way
    (reference :1389-1399)."""
    from egom2p_tpu.core.distributed import all_reduce_metrics

    if domain in ("rgb", "depth"):
        # clips are large: stream batches into accumulators instead of
        # materializing the whole eval set in host RAM (the reference
        # streams through torchmetrics .update() the same way, :1598-1652)
        results = _video_metrics_stream(tok, data, domain, batch_size,
                                        limit, no_inception, codebook_size)
        if results is None:
            return {}
        return all_reduce_metrics(results, mesh=mesh)

    preds, gts, all_tokens = [], [], []
    for batch in _batches_of(data, batch_size, limit):
        rec, tokens = _autoencode_and_tokens(tok, batch)
        preds.append(rec)
        gts.append(batch)
        all_tokens.append(tokens.reshape(len(batch), -1))
    if not preds:
        return {}
    pred = np.concatenate(preds)
    gt = np.concatenate(gts)
    tokens = np.concatenate(all_tokens)

    results: Dict[str, float] = {}
    if domain == "cam":
        results.update(_cam_metrics(pred, gt))
    elif domain == "gaze":
        results.update(_gaze_metrics(pred, gt))
    else:
        from egom2p_tpu.models.teachers import TEACHER_SPECS
        if domain not in TEACHER_SPECS:
            raise ValueError(f"unknown eval domain {domain}")
        # feature domains: MSE/MAE/PSNR only — the reference builds exactly
        # these three for DENSE_FEAT_MODALITIES (run_training_vqvae.py:
        # 1546-1562, data_range=1) and skips SSIM/FID/IS
        results.update({"mse": M.mse(pred, gt), "mae": M.mae(pred, gt),
                        "psnr": M.psnr(pred, gt, data_range=1.0)})

    # codebook usage over 256-sample windows (reference :1711-1719)
    window = 256 * tokens.shape[1]
    results["codebook_usage"] = M.codebook_usage(tokens, codebook_size,
                                                 window=window)
    return all_reduce_metrics(results, mesh=mesh)


def _video_metrics_stream(tok, data, domain: str, batch_size: int,
                          limit, no_inception: bool,
                          codebook_size: int) -> Optional[Dict[str, float]]:
    """Streaming rgb/depth metric suite: per-batch autoencode, accumulate
    MSE/MAE sums (psnr from the global MSE, identical to the whole-set
    computation), per-frame MS-SSIM/LPIPS means, FID feature moments and
    IS probs — one InceptionV3 forward per split, shared between FID and
    IS.  rgb metrics in [0,1] per frame (reference :1598-1652); depth on
    the standardized channel (reference :1604-1608)."""
    from egom2p_tpu.core.image_metrics import (MissingPretrainedWeights,
                                               fid_from_features,
                                               get_inception_fns,
                                               get_lpips,
                                               inception_score_from_probs,
                                               ms_ssim)

    lpips = inception = None
    if domain == "rgb":
        try:
            lpips = get_lpips()
        except (MissingPretrainedWeights, NotImplementedError):
            pass
        try:
            inception = get_inception_fns()
        except (MissingPretrainedWeights, NotImplementedError):
            pass

    data_range = 1.0 if domain == "rgb" else 2.0
    sq = ab = n_el = 0.0
    ssim_sum = lpips_sum = frames_n = 0.0
    feats_r, feats_f, probs_f = [], [], []
    ssim_ok = True
    tokens_list = []
    for batch in _batches_of(data, batch_size, limit):
        rec, tokens = _autoencode_and_tokens(tok, batch)
        tokens_list.append(tokens.reshape(len(batch), -1))
        if domain == "rgb":
            # [-1,1] -> [0,1] (reference denormalize mean/std 0.5, :1599-1601)
            p = np.clip(rec * 0.5 + 0.5, 0.0, 1.0)
            g = batch * 0.5 + 0.5
        else:
            p, g = rec, batch
        diff = p - g
        sq += float(np.sum(diff ** 2))
        ab += float(np.sum(np.abs(diff)))
        n_el += diff.size
        if domain == "rgb":
            fp = p.reshape(-1, *p.shape[-3:])  # (B*T, H, W, C) frames
            fg = g.reshape(-1, *g.shape[-3:])
            ssim_ok = min(fp.shape[-3:-1]) >= 176  # 5-scale minimum side
            if ssim_ok:
                ssim_sum += ms_ssim(fp, fg, data_range=1.0) * len(fp)
            if lpips is not None:
                lpips_sum += lpips(fp * 2 - 1, fg * 2 - 1) * len(fp)
            if inception is not None:
                feature_fn, _, run = inception
                f, pr = run(fp)  # one forward feeds FID-fake AND IS
                feats_f.append(f)
                probs_f.append(pr)
                feats_r.append(feature_fn(fg))
            frames_n += len(fp)
    if not tokens_list:
        return None

    m = sq / n_el
    out = {"mse": m, "mae": ab / n_el,
           "psnr": float("inf") if m == 0 else
           float(10 * np.log10(data_range ** 2 / m))}
    if domain == "rgb" and frames_n:
        if ssim_ok:
            out["ms_ssim"] = ssim_sum / frames_n
        if lpips is not None:
            out["lpips"] = lpips_sum / frames_n
        if inception is not None:
            out["fid"] = fid_from_features(np.concatenate(feats_r),
                                           np.concatenate(feats_f))
            if not no_inception:
                out["inception_score"] = inception_score_from_probs(
                    np.concatenate(probs_f))
    tokens = np.concatenate(tokens_list)
    out["codebook_usage"] = M.codebook_usage(tokens, codebook_size,
                                             window=256 * tokens.shape[1])
    return out


def _cam_metrics(pred, gt) -> Dict[str, float]:
    """Denormalized 9D trajectory metrics (reference :1653-1663)."""
    from egom2p_tpu.data.cam_gaze import denormalize_cam

    p = denormalize_cam(pred)
    g = denormalize_cam(gt)
    return {
        "mse": M.mse(p, g),
        "mae_transl": M.mae(p[..., 6:], g[..., 6:]),
        "psnr": M.psnr(p, g, data_range=2.0),
        "cam_rot_deg": M.rotation_distance_deg(p, g),
    }


def _gaze_metrics(pred, gt) -> Dict[str, float]:
    """Mask-selected gaze metrics: gt carries (x, y, valid) channels, pred
    reconstructs (x, y) (reference :1664-1672)."""
    from egom2p_tpu.data.cam_gaze import denormalize_gaze

    mask = gt[..., 2] > 0.5
    p = denormalize_gaze(pred[..., :2])
    g = denormalize_gaze(gt[..., :2])
    if mask.sum() == 0:  # keep the key set stable across epochs
        return {"mse": 0.0, "mae": 0.0, "psnr": 0.0}
    pm, gm = p[mask], g[mask]
    return {"mse": M.mse(pm, gm), "mae": M.mae(pm, gm),
            "psnr": M.psnr(pm, gm, data_range=1.0)}


class _EvalView:
    """Lightweight tokenizer view with swapped-in params, so EMA weights can
    be evaluated without mutating the training tokenizer
    (reference evaluates `model_ema.module` the same way, :1367-1399)."""

    def __init__(self, tok, params, vq_state=None):
        import copy
        self._tok = copy.copy(tok)
        self._tok.params = params
        if vq_state is not None:
            self._tok.vq_state = vq_state

    def autoencode(self, x):
        return self._tok.autoencode(x)

    def tokenize(self, x):
        return self._tok.tokenize(x)


def run_eval_suite(tok, state, data, domain: str, codebook_size: int,
                   loss_fn: str, codebook_weight: float, batch_size: int,
                   limit: Optional[int] = None, mesh=None,
                   no_inception: bool = False) -> Dict[str, float]:
    """The `eval_during_training` analog (reference :1296-1419): loss eval +
    metric suite on the live weights, then again on the EMA weights when the
    train state carries them.  Returns a flat dict; EMA keys get an `ema_`
    prefix (reference uses an '[EMA Eval]' prefix)."""
    vq_state = getattr(state, "vq_state", None)
    live = _EvalView(tok, state.params, vq_state)
    out = dict(evaluate_loss(live, data, loss_fn, codebook_weight,
                             batch_size, tok.module.n_channels, limit, mesh))
    out.update(eval_metrics(live, data, domain, codebook_size, batch_size,
                            limit, mesh, no_inception))
    ema_params = getattr(state, "ema_params", None)
    if ema_params is not None:
        ema = _EvalView(tok, ema_params, vq_state)
        ema_out = eval_metrics(ema, data, domain, codebook_size, batch_size,
                               limit, mesh, no_inception)
        out.update({f"ema_{k}": v for k, v in ema_out.items()})
    return out

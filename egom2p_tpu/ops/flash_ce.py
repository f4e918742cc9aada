"""Flash cross-entropy row statistics for the large-vocab decoder heads.

The training loss needs, per target row, ``logsumexp(logits)`` and the
gold (target-id) logit of ``logits = y @ W.T`` over a 64k vocab.  XLA
materializes each (rows, vocab) fp32 logits tile in HBM before reducing
it — at the pretraining shapes that is a 512 MB round trip per 2048-row
chunk, which is why the chunked CE forward measures ~60% of its matmul
bound (docs/DESIGN.md "Why train MFU sits at ~36%").  This kernel tiles
the vocab dimension in VMEM with an online (running max) logsumexp, so
the logits never exist in HBM at all: the forward is one pass of pure
MXU matmuls plus a fused VPU reduction.

The backward ships in BOTH forms.  Default: ``jax.custom_vjp`` routes
through the chunked XLA recompute the previous ``jax.checkpoint`` scan
executed.  ``EGOM2P_CE_PALLAS_BWD=1`` switches to the fused one-pass
Pallas backward (``_bwd_pallas``: ONE logit recompute per tile feeding
both contractions, probabilities never in HBM) — built as the round-5
"attack the backward once more" candidate and measured on-chip AT PARITY
but not ahead: B=8 full train step 451.0 ms (br=256) / 454.4 (br=512) /
584.8 (br=1024) vs 448.2 ms chunked-XLA control, A/B/A.  XLA's epilogue
fusion already keeps the (chunk, V) probability tile out of HBM, so the
hand-fused kernel has no traffic left to save; the chunked form stays
the default and the kernel remains as the measured A/B reference
(interpret-mode grad-parity test: tests/test_flash_ce.py).

Numerics match the dense reference exactly up to fp32 reduction order:
bf16 inputs, fp32 logits, fp32 running stats (the reference computes CE
from fully materialized fp32 logits — egom2p/models/egom2p_model.py:
553-680).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

_LOG2E = float(np.log2(np.e))
_NEG = -1e30

# vocab tile candidates: multiples of 128 (lane width), largest first so
# the MXU sees deep, wide tiles; a candidate is eligible when it divides
# the (possibly padded) vocab
_BV_CANDIDATES = (6400, 4096, 3200, 2048, 1600, 1280, 1024, 512, 256, 128)


def flash_ce_available() -> bool:
    """CE's OWN backend probe — deliberately not shared with the attention
    routing probes (``supports_flash`` / ``flash_backend_available``), which
    tests monkeypatch to force flash64 attention routing on CPU.  CE must
    never follow those onto a backend where a non-interpret pallas_call
    would crash (round-4 regression)."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def _pick_bv(vocab: int) -> tuple[int, int]:
    """(padded_vocab, bv).  Prefers a tile that divides the vocab exactly;
    otherwise pads the weight rows up to a multiple of 4096 and lets the
    kernel mask the fake columns."""
    bv = int(os.environ.get("EGOM2P_CE_BV", "0"))
    if bv:
        return ((vocab + bv - 1) // bv) * bv, bv
    for cand in _BV_CANDIDATES:
        if cand <= vocab and vocab % cand == 0:
            return vocab, cand
    pad_to = 4096
    return ((vocab + pad_to - 1) // pad_to) * pad_to, pad_to


def _ce_fwd_kernel(y_ref, w_ref, t_ref, logz_ref, gold_ref, m_ref, s_ref,
                   g_ref, *, bv: int, vocab: int, n_j: int):
    """Grid (row block i, vocab block j), j fastest.  Scratch m/s/g hold
    the running row max, scaled sumexp, and gold logit across the j loop
    (TPU grid steps are sequential, so VMEM scratch persists)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, _NEG)
        s_ref[...] = jnp.zeros_like(s_ref)
        g_ref[...] = jnp.zeros_like(g_ref)

    y = y_ref[0]                       # (br, D) bf16
    w = w_ref[0]                       # (bv, D) bf16
    br = y.shape[0]
    dn = (((1,), (1,)), ((), ()))      # contract D
    s = jax.lax.dot_general(y, w, dn, preferred_element_type=jnp.float32)
    cols = j * bv + jax.lax.broadcasted_iota(jnp.int32, (br, bv), 1)
    if vocab % bv:                     # padded weight rows: mask fake cols
        s = jnp.where(cols < vocab, s, _NEG)
    t = t_ref[0].reshape(br, 1)        # row-aligned targets
    g_ref[...] += jnp.sum(jnp.where(cols == t, s, 0.0), axis=1,
                          keepdims=True)

    m_old = m_ref[...]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    alpha = jnp.exp2((m_old - m_new) * _LOG2E)
    s_ref[...] = (s_ref[...] * alpha
                  + jnp.sum(jnp.exp2((s - m_new) * _LOG2E), axis=1,
                            keepdims=True))
    m_ref[...] = m_new

    @pl.when(j == n_j - 1)
    def _emit():
        logz = m_ref[...] + jnp.log2(s_ref[...]) / _LOG2E
        logz_ref[0] = logz.reshape(1, br)[0]
        gold_ref[0] = g_ref[...].reshape(1, br)[0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _row_stats(y, w_mat, targets, interpret: bool = False):
    """(logz, gold) per row of ``y @ w_mat.T`` without HBM logits.

    y (R, D) bf16, w_mat (V, D) bf16, targets (R,) int32 ->
    two (R,) fp32 vectors.
    """
    from jax.experimental.pallas import tpu as pltpu

    R, D = y.shape
    V = w_mat.shape[0]
    br = int(os.environ.get("EGOM2P_CE_BR", "0")) or 512
    br = min(br, max(128, ((R + 127) // 128) * 128))
    Vp, bv = _pick_bv(V)
    Rp = ((R + br - 1) // br) * br
    if Rp != R:
        y = jnp.pad(y, ((0, Rp - R), (0, 0)))
        targets = jnp.pad(targets, (0, Rp - R))
    if Vp != V:
        w_mat = jnp.pad(w_mat, ((0, Vp - V), (0, 0)))
    n_j = Vp // bv

    logz, gold = pl.pallas_call(
        functools.partial(_ce_fwd_kernel, bv=bv, vocab=V, n_j=n_j),
        grid=(Rp // br, n_j),
        in_specs=[
            pl.BlockSpec((1, br, D), lambda i, j: (0, i, 0)),
            pl.BlockSpec((1, bv, D), lambda i, j: (0, j, 0)),
            pl.BlockSpec((1, br), lambda i, j: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, br), lambda i, j: (0, i)),
            pl.BlockSpec((1, br), lambda i, j: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
            jax.ShapeDtypeStruct((1, Rp), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((br, 1), jnp.float32),
            pltpu.VMEM((br, 1), jnp.float32),
            pltpu.VMEM((br, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(y[None], w_mat[None], targets[None].astype(jnp.int32))
    return logz[0, :R], gold[0, :R]


def _ce_bwd_kernel(y_ref, w_ref, t_ref, wc_ref, lz_ref, dy_ref, dw_ref, *,
                   bv: int, vocab: int, n_i: int, n_j: int):
    """Fused one-pass backward: grid (vocab block j, row block i), i
    fastest.  Per (j, i): recompute the (br, bv) logit tile, form
    dl = (softmax - onehot) * w, and contract it BOTH ways.  The dW
    output block is keyed by j only, so it stays VMEM-resident across
    the inner i loop (fp32 accumulator, written once per j); the dy
    block is keyed by i and revisits non-consecutively — Pallas spills
    it to HBM between j steps (~0.5 ms of traffic at the pretraining
    shapes, the price of single-recompute instead of the split XLA
    scan's per-chunk p rebuild)."""
    i = pl.program_id(1)
    j = pl.program_id(0)

    @pl.when(i == 0)
    def _init_dw():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    @pl.when(j == 0)
    def _init_dy():
        dy_ref[...] = jnp.zeros_like(dy_ref)

    y = y_ref[0]                           # (br, D) bf16
    w = w_ref[0]                           # (bv, D) bf16
    br = y.shape[0]
    dn = (((1,), (1,)), ((), ()))          # contract D
    s = jax.lax.dot_general(y, w, dn, preferred_element_type=jnp.float32)
    cols = j * bv + jax.lax.broadcasted_iota(jnp.int32, (br, bv), 1)
    if vocab % bv:                         # padded weight rows
        s = jnp.where(cols < vocab, s, _NEG)
    p = jnp.exp(s - lz_ref[0].reshape(br, 1))
    t = t_ref[0].reshape(br, 1)
    dl = ((p - (cols == t)) * wc_ref[0].reshape(br, 1)).astype(y.dtype)
    dy_ref[0] += jnp.dot(dl, w, preferred_element_type=jnp.float32)
    tn = (((0,), (0,)), ((), ()))          # contract rows
    dw_ref[0] += jax.lax.dot_general(dl, y, tn,
                                     preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_pallas(y, w_bf, targets, wc, logz, interpret: bool = False):
    """(dy fp32 (R, D), dW fp32 (V, D)) via the fused kernel.  wc is the
    per-row weight ALREADY scaled by the upstream cotangent."""
    from jax.experimental.pallas import tpu as pltpu

    R, D = y.shape
    V = w_bf.shape[0]
    br = int(os.environ.get("EGOM2P_CE_BWD_BR", "0")) or 512
    br = min(br, max(128, ((R + 127) // 128) * 128))
    Vp, bv = _pick_bv(V)
    Rp = ((R + br - 1) // br) * br
    if Rp != R:
        y = jnp.pad(y, ((0, Rp - R), (0, 0)))
        targets = jnp.pad(targets, (0, Rp - R))
        wc = jnp.pad(wc, (0, Rp - R))
        logz = jnp.pad(logz, (0, Rp - R))
    if Vp != V:
        w_bf = jnp.pad(w_bf, ((0, Vp - V), (0, 0)))
    n_i, n_j = Rp // br, Vp // bv

    dy, dw = pl.pallas_call(
        functools.partial(_ce_bwd_kernel, bv=bv, vocab=V, n_i=n_i, n_j=n_j),
        grid=(n_j, n_i),
        in_specs=[
            pl.BlockSpec((1, br, D), lambda j, i: (0, i, 0)),
            pl.BlockSpec((1, bv, D), lambda j, i: (0, j, 0)),
            pl.BlockSpec((1, br), lambda j, i: (0, i)),
            pl.BlockSpec((1, br), lambda j, i: (0, i)),
            pl.BlockSpec((1, br), lambda j, i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, br, D), lambda j, i: (0, i, 0)),
            pl.BlockSpec((1, bv, D), lambda j, i: (0, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Rp, D), jnp.float32),
            jax.ShapeDtypeStruct((1, Vp, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(y[None], w_bf[None], targets[None].astype(jnp.int32),
      wc[None].astype(jnp.float32), logz[None])
    return dy[0, :R], dw[0, :V]


def _bwd_chunked(y, w_bf, targets, wts, logz, g, chunk: int):
    """dy, dW for total = sum(wts * (logz - gold)), upstream cotangent g.

    Same executed shape of work as AD through the previous
    jax.checkpoint'ed scan (recompute logits once, two bf16 matmuls per
    chunk), with the (chunk, V) probabilities kept to one fp32 tile that
    XLA fuses into the matmul epilogues.
    """
    R, D = y.shape
    V = w_bf.shape[0]
    pad = (-R) % chunk
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0)))
        targets = jnp.pad(targets, (0, pad))
        wts = jnp.pad(wts, (0, pad))
        logz = jnp.pad(logz, (0, pad))
    n = y.shape[0] // chunk
    yc = y.reshape(n, chunk, D)
    tc = targets.reshape(n, chunk)
    wc = (wts * g).reshape(n, chunk).astype(jnp.float32)
    lc = logz.reshape(n, chunk)

    def body(dw, inp):
        y_c, t_c, w_c, l_c = inp
        dn = (((1,), (1,)), ((), ()))
        logits = jax.lax.dot_general(y_c, w_bf, dn,
                                     preferred_element_type=jnp.float32)
        p = jnp.exp(logits - l_c[:, None])
        cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, V), 1)
        dl = ((p - (cols == t_c[:, None])) * w_c[:, None]).astype(w_bf.dtype)
        dy_c = jnp.dot(dl, w_bf, preferred_element_type=jnp.float32)
        tn = (((0,), (0,)), ((), ()))
        dw = dw + jax.lax.dot_general(dl, y_c, tn,
                                      preferred_element_type=jnp.float32)
        return dw, dy_c

    dw, dy = jax.lax.scan(body, jnp.zeros((V, D), jnp.float32),
                          (yc, tc, wc, lc))
    return dy.reshape(-1, D)[:R].astype(y.dtype), dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _flash_ce_total(y, w_mat, targets_f, wts, chunk, interpret):
    logz, gold = _row_stats(y, w_mat.astype(y.dtype),
                            targets_f.astype(jnp.int32), interpret)
    return jnp.sum((logz - gold) * wts)


def _flash_ce_total_fwd(y, w_mat, targets_f, wts, chunk, interpret):
    t = targets_f.astype(jnp.int32)
    logz, gold = _row_stats(y, w_mat.astype(y.dtype), t, interpret)
    total = jnp.sum((logz - gold) * wts)
    return total, (y, w_mat, t, wts, logz)


def _flash_ce_total_bwd(chunk, interpret, res, g):
    y, w_mat, t, wts, logz = res
    # EGOM2P_CE_PALLAS_BWD=1 routes through the fused one-pass Pallas
    # backward (round-5 A/B candidate: one logit recompute feeding both
    # contractions, probabilities never in HBM) instead of the chunked XLA
    # scan; trace-time switch, cache-keyed by the surrounding jit.
    if os.environ.get("EGOM2P_CE_PALLAS_BWD", "0") == "1":
        dy, dw = _bwd_pallas(y, w_mat.astype(y.dtype), t,
                             wts * g, logz, interpret)
        return (dy.astype(y.dtype), dw.astype(w_mat.dtype),
                jnp.zeros_like(wts), wts * 0.0)
    dy, dw = _bwd_chunked(y, w_mat.astype(y.dtype), t, wts, logz, g, chunk)
    return dy, dw.astype(w_mat.dtype), jnp.zeros_like(wts), wts * 0.0


_flash_ce_total.defvjp(_flash_ce_total_fwd, _flash_ce_total_bwd)


def flash_ce_total(y, w_mat, targets, wts, *, chunk: int = 2048,
                   interpret: bool = False):
    """sum(wts * cross_entropy(y @ w_mat.T, targets)) without HBM logits.

    y (R, D) activations (bf16 in training), w_mat (V, D) head weight
    (any float dtype; cast to y's dtype for the matmuls, exactly like
    ``forward_logits``), targets (R,) int ids already clamped into
    [0, V), wts (R,) fp32 row weights (0 for other-modality rows).

    Differentiable wrt y and w_mat; targets/wts get zero cotangents.
    """
    if y.shape[-1] % 128:
        raise ValueError("flash_ce needs the model dim to be a multiple "
                         f"of 128, got {y.shape[-1]}")
    return _flash_ce_total(y, w_mat, targets.astype(jnp.float32),
                           wts.astype(jnp.float32), chunk, interpret)

"""Training flash attention for head_dim 64 (Pallas TPU, fwd + bwd).

Extends the inference kernel's design (ops/flash64.py — projection layout,
head-pair grid programs, VMEM-resident counterpart operand, exp2-domain
online softmax) to the training path that the profile says dominates the
step: flash kernels are ~35% of train-step device time and the
(B, N, C) <-> (B, H, N, hd) layout copies around the stock kernels another
~11% (docs/DESIGN.md "Train-step profile").  Covers all three training
attentions: the padding-masked encoder self-attention and decoder
cross-attention (kv_blocked mode), and the decoder's segment-masked
self-attention (segments mode, EGOM2P_F64T_SEG to A/B it separately).

Deliberately a SEPARATE module from flash64.py: the persistent compile
cache keys on source line numbers inside Pallas HLO, so touching the
inference kernel would force a full recompile of the generation chain.

Layout/semantics:

  * q, k, v, o, do: (B, N|M, H*64) bf16 matmul inputs, fp32 accumulation —
    no head transposes anywhere (the projections' natural layout).
  * Forward additionally emits L2 per row (B, n_pairs, 2, N) — m + log2(l)
    in safemax mode, log2(l) in clamp-only mode — so the backward
    recomputes true probabilities as p = exp2(s - L2) (clamp-only: with
    the same min(s, 80) clamp as the forward, keeping gradient and output
    consistent at any logit magnitude) without a second online pass;
    fully-masked rows store L2 = +BIG so p == 0 and their gradients
    vanish (matching the dense path's zeros).
  * dq pass: KV resident per (batch, head-pair), q-block grid — the two
    hd-64 contractions (scores, dp) use the paired-lane trick; ds @ k
    contracts the full kv block width.
  * dk/dv pass: q/do resident per (batch, head-pair), kv-block grid;
    p^T @ do and ds^T @ q contract the full q block width.
  * key-padding enters as an additive f32 bias row (True = blocked),
    exactly like the inference kernel; query-side padding is safe because
    padded do rows are zero (=> ds rows are zero).
  * segment mode (the decoder's same-modality self-attention,
    ops/attention.py:SegmentMask): the kernels carry f32 segment-id rows
    for queries and keys and compute the block mask as seg_q != seg_k on
    the VPU — one compare+select per score block instead of a gathered
    (N, N) boolean.  Sequence padding uses distinct q/k sentinels so pad
    rows are fully masked (dead rows -> zero output and zero grads).
"""
from __future__ import annotations

import functools
import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LOG2E = math.log2(math.e)
_NEG_INF = -1e30
_DEAD_L2 = 1e30  # rows with no live key: p = exp2(s - BIG) == 0 in bwd


def _pad_axis(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


# ------------------------------------------------------------------ forward
def _fwd_kernel(bias_ref, segq_ref, q_ref, k_ref, v_ref, o_ref, l2_ref, *,
                bk: int, n_kv: int, scale: float, mask_mode: str,
                safemax: bool = True):
    q = q_ref[0]  # (bq, 128): two heads side by side
    qa, qb = q[:, :64], q[:, 64:]
    bq = q.shape[0]
    if mask_mode == "seg":
        seg_q = segq_ref[0, 0].reshape(bq, 1)

    def scores(j):
        kblk = k_ref[0, pl.ds(j * bk, bk), :]
        dn = (((1,), (1,)), ((), ()))
        s_a = jax.lax.dot_general(qa, kblk[:, :64], dn,
                                  preferred_element_type=jnp.float32) * scale
        s_b = jax.lax.dot_general(qb, kblk[:, 64:], dn,
                                  preferred_element_type=jnp.float32) * scale
        if mask_mode == "kp":
            bias = bias_ref[0, 0, pl.ds(j * bk, bk)].reshape(1, bk)
            s_a = s_a + bias
            s_b = s_b + bias
        elif mask_mode == "seg":
            seg_k = bias_ref[0, 0, pl.ds(j * bk, bk)].reshape(1, bk)
            bias = jnp.where(seg_q != seg_k, _NEG_INF, 0.0)
            s_a = s_a + bias
            s_b = s_b + bias
        return s_a, s_b

    if not safemax:
        # Clamp-only softmax (same contract as ops/flash64.py): no running
        # max, no rescale — the loop body is dot->exp2->dot and the VPU
        # work overlaps the MXU.  L2 = log2(l) keeps the backward's
        # p = exp2(s - L2) recomputation exact.
        def kv_step_ns(j, carry):
            l_a, l_b, acc_a, acc_b = carry
            s_a, s_b = scores(j)
            p_a = jnp.exp2(jnp.minimum(s_a, 80.0))
            p_b = jnp.exp2(jnp.minimum(s_b, 80.0))
            l_a = l_a + p_a.sum(axis=-1, keepdims=True)
            l_b = l_b + p_b.sum(axis=-1, keepdims=True)
            vblk = v_ref[0, pl.ds(j * bk, bk), :]
            acc_a = acc_a + jnp.dot(p_a.astype(vblk.dtype), vblk[:, :64],
                                    preferred_element_type=jnp.float32)
            acc_b = acc_b + jnp.dot(p_b.astype(vblk.dtype), vblk[:, 64:],
                                    preferred_element_type=jnp.float32)
            return l_a, l_b, acc_a, acc_b

        z1 = jnp.zeros((bq, 1), jnp.float32)
        z64 = jnp.zeros((bq, 64), jnp.float32)
        l_a, l_b, acc_a, acc_b = jax.lax.fori_loop(
            0, n_kv, kv_step_ns, (z1, z1, z64, z64))
        dead_a = l_a <= 0
        dead_b = l_b <= 0
        o_a = jnp.where(dead_a, 0.0, acc_a / jnp.where(l_a > 0, l_a, 1.0))
        o_b = jnp.where(dead_b, 0.0, acc_b / jnp.where(l_b > 0, l_b, 1.0))
        o_ref[0] = jnp.concatenate([o_a, o_b], axis=-1).astype(o_ref.dtype)
        l2_a = jnp.where(dead_a, _DEAD_L2,
                         jnp.log2(jnp.where(l_a > 0, l_a, 1.0)))
        l2_b = jnp.where(dead_b, _DEAD_L2,
                         jnp.log2(jnp.where(l_b > 0, l_b, 1.0)))
        l2_ref[0, 0] = jnp.concatenate(
            [l2_a.reshape(1, bq), l2_b.reshape(1, bq)], axis=0)
        return

    def kv_step(j, carry):
        m_a, m_b, l_a, l_b, acc_a, acc_b = carry
        s_a, s_b = scores(j)
        new_m_a = jnp.maximum(m_a, s_a.max(axis=-1, keepdims=True))
        new_m_b = jnp.maximum(m_b, s_b.max(axis=-1, keepdims=True))
        alpha_a = jnp.exp2(m_a - new_m_a)
        alpha_b = jnp.exp2(m_b - new_m_b)
        p_a = jnp.exp2(s_a - new_m_a)
        p_b = jnp.exp2(s_b - new_m_b)
        l_a = l_a * alpha_a + p_a.sum(axis=-1, keepdims=True)
        l_b = l_b * alpha_b + p_b.sum(axis=-1, keepdims=True)
        vblk = v_ref[0, pl.ds(j * bk, bk), :]
        acc_a = acc_a * alpha_a + jnp.dot(p_a.astype(vblk.dtype), vblk[:, :64],
                                          preferred_element_type=jnp.float32)
        acc_b = acc_b * alpha_b + jnp.dot(p_b.astype(vblk.dtype), vblk[:, 64:],
                                          preferred_element_type=jnp.float32)
        return new_m_a, new_m_b, l_a, l_b, acc_a, acc_b

    init = (jnp.full((bq, 1), _NEG_INF, jnp.float32),
            jnp.full((bq, 1), _NEG_INF, jnp.float32),
            jnp.zeros((bq, 1), jnp.float32),
            jnp.zeros((bq, 1), jnp.float32),
            jnp.zeros((bq, 64), jnp.float32),
            jnp.zeros((bq, 64), jnp.float32))
    m_a, m_b, l_a, l_b, acc_a, acc_b = jax.lax.fori_loop(
        0, n_kv, kv_step, init)
    dead_a = m_a <= _NEG_INF * 0.5
    dead_b = m_b <= _NEG_INF * 0.5
    o_a = jnp.where(dead_a, 0.0, acc_a / jnp.where(l_a > 0, l_a, 1.0))
    o_b = jnp.where(dead_b, 0.0, acc_b / jnp.where(l_b > 0, l_b, 1.0))
    o_ref[0] = jnp.concatenate([o_a, o_b], axis=-1).astype(o_ref.dtype)
    l2_a = jnp.where(dead_a, _DEAD_L2,
                     m_a + jnp.log2(jnp.where(l_a > 0, l_a, 1.0)))
    l2_b = jnp.where(dead_b, _DEAD_L2,
                     m_b + jnp.log2(jnp.where(l_b > 0, l_b, 1.0)))
    l2_ref[0, 0] = jnp.concatenate([l2_a.reshape(1, bq), l2_b.reshape(1, bq)],
                                   axis=0)


# ----------------------------------------------------------------- backward
def _dq_kernel(bias_ref, segq_ref, q_ref, do_ref, l2_ref, d_ref, k_ref,
               v_ref, dq_ref, *, bk: int, n_kv: int, scale2: float,
               nat_scale: float, mask_mode: str, clamp: bool):
    q = q_ref[0]
    do = do_ref[0]
    qa, qb = q[:, :64], q[:, 64:]
    doa, dob = do[:, :64], do[:, 64:]
    bq = q.shape[0]
    l2_a = l2_ref[0, 0, 0].reshape(bq, 1)
    l2_b = l2_ref[0, 0, 1].reshape(bq, 1)
    d_a = d_ref[0, 0, 0].reshape(bq, 1)
    d_b = d_ref[0, 0, 1].reshape(bq, 1)
    if mask_mode == "seg":
        seg_q = segq_ref[0, 0].reshape(bq, 1)

    dn = (((1,), (1,)), ((), ()))

    def kv_step(j, carry):
        acc_a, acc_b = carry
        kblk = k_ref[0, pl.ds(j * bk, bk), :]
        vblk = v_ref[0, pl.ds(j * bk, bk), :]
        s_a = jax.lax.dot_general(qa, kblk[:, :64], dn,
                                  preferred_element_type=jnp.float32) * scale2
        s_b = jax.lax.dot_general(qb, kblk[:, 64:], dn,
                                  preferred_element_type=jnp.float32) * scale2
        if mask_mode == "kp":
            bias = bias_ref[0, 0, pl.ds(j * bk, bk)].reshape(1, bk)
            s_a = s_a + bias
            s_b = s_b + bias
        elif mask_mode == "seg":
            seg_k = bias_ref[0, 0, pl.ds(j * bk, bk)].reshape(1, bk)
            bias = jnp.where(seg_q != seg_k, _NEG_INF, 0.0)
            s_a = s_a + bias
            s_b = s_b + bias
        if clamp:  # mirror the clamp-only forward EXACTLY (p_fwd / l);
            # without this, scores past +80 exp2 units would make the
            # recomputed p disagree with the forward (or overflow to inf)
            s_a = jnp.minimum(s_a, 80.0)
            s_b = jnp.minimum(s_b, 80.0)
        p_a = jnp.exp2(s_a - l2_a)  # true probabilities (masked cols -> 0)
        p_b = jnp.exp2(s_b - l2_b)
        dp_a = jax.lax.dot_general(doa, vblk[:, :64], dn,
                                   preferred_element_type=jnp.float32)
        dp_b = jax.lax.dot_general(dob, vblk[:, 64:], dn,
                                   preferred_element_type=jnp.float32)
        ds_a = (p_a * (dp_a - d_a)).astype(kblk.dtype)
        ds_b = (p_b * (dp_b - d_b)).astype(kblk.dtype)
        acc_a = acc_a + jnp.dot(ds_a, kblk[:, :64],
                                preferred_element_type=jnp.float32)
        acc_b = acc_b + jnp.dot(ds_b, kblk[:, 64:],
                                preferred_element_type=jnp.float32)
        return acc_a, acc_b

    acc_a, acc_b = jax.lax.fori_loop(
        0, n_kv, kv_step, (jnp.zeros((bq, 64), jnp.float32),
                           jnp.zeros((bq, 64), jnp.float32)))
    dq_ref[0] = (jnp.concatenate([acc_a, acc_b], axis=-1)
                 * nat_scale).astype(dq_ref.dtype)


def _dkv_kernel(bias_ref, segq_ref, q_ref, do_ref, l2_ref, d_ref, k_ref,
                v_ref, dk_ref, dv_ref, *, bq: int, n_q: int, scale2: float,
                nat_scale: float, mask_mode: str, clamp: bool):
    kblk = k_ref[0]  # (bk, 128)
    vblk = v_ref[0]
    bk = kblk.shape[0]
    if mask_mode == "kp":
        bias = bias_ref[0, 0].reshape(1, bk)
    elif mask_mode == "seg":
        seg_k = bias_ref[0, 0].reshape(1, bk)

    def q_step(i, carry):
        dk_a, dk_b, dv_a, dv_b = carry
        q = q_ref[0, pl.ds(i * bq, bq), :]
        do = do_ref[0, pl.ds(i * bq, bq), :]
        qa, qb = q[:, :64], q[:, 64:]
        doa, dob = do[:, :64], do[:, 64:]
        l2_a = l2_ref[0, 0, 0, pl.ds(i * bq, bq)].reshape(bq, 1)
        l2_b = l2_ref[0, 0, 1, pl.ds(i * bq, bq)].reshape(bq, 1)
        d_a = d_ref[0, 0, 0, pl.ds(i * bq, bq)].reshape(bq, 1)
        d_b = d_ref[0, 0, 1, pl.ds(i * bq, bq)].reshape(bq, 1)
        dn = (((1,), (1,)), ((), ()))
        s_a = jax.lax.dot_general(qa, kblk[:, :64], dn,
                                  preferred_element_type=jnp.float32) * scale2
        s_b = jax.lax.dot_general(qb, kblk[:, 64:], dn,
                                  preferred_element_type=jnp.float32) * scale2
        if mask_mode == "kp":
            s_a = s_a + bias
            s_b = s_b + bias
        elif mask_mode == "seg":
            seg_q = segq_ref[0, 0, pl.ds(i * bq, bq)].reshape(bq, 1)
            bias_sq = jnp.where(seg_q != seg_k, _NEG_INF, 0.0)
            s_a = s_a + bias_sq
            s_b = s_b + bias_sq
        if clamp:  # mirror the clamp-only forward (see _dq_kernel)
            s_a = jnp.minimum(s_a, 80.0)
            s_b = jnp.minimum(s_b, 80.0)
        p_a = jnp.exp2(s_a - l2_a)
        p_b = jnp.exp2(s_b - l2_b)
        # dv += p^T @ do (full bq contraction)
        tn = (((0,), (0,)), ((), ()))
        dv_a = dv_a + jax.lax.dot_general(p_a.astype(doa.dtype), doa, tn,
                                          preferred_element_type=jnp.float32)
        dv_b = dv_b + jax.lax.dot_general(p_b.astype(dob.dtype), dob, tn,
                                          preferred_element_type=jnp.float32)
        dp_a = jax.lax.dot_general(doa, vblk[:, :64], dn,
                                   preferred_element_type=jnp.float32)
        dp_b = jax.lax.dot_general(dob, vblk[:, 64:], dn,
                                   preferred_element_type=jnp.float32)
        ds_a = (p_a * (dp_a - d_a)).astype(qa.dtype)
        ds_b = (p_b * (dp_b - d_b)).astype(qb.dtype)
        dk_a = dk_a + jax.lax.dot_general(ds_a, qa, tn,
                                          preferred_element_type=jnp.float32)
        dk_b = dk_b + jax.lax.dot_general(ds_b, qb, tn,
                                          preferred_element_type=jnp.float32)
        return dk_a, dk_b, dv_a, dv_b

    z = jnp.zeros((bk, 64), jnp.float32)
    dk_a, dk_b, dv_a, dv_b = jax.lax.fori_loop(0, n_q, q_step, (z, z, z, z))
    dk_ref[0] = (jnp.concatenate([dk_a, dk_b], axis=-1)
                 * nat_scale).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate([dv_a, dv_b], axis=-1).astype(dv_ref.dtype)


def _dqkv_kernel(bias_ref, segq_ref, q_ref, do_ref, l2_ref, d_ref, k_ref,
                 v_ref, dq_ref, dk_ref, dv_ref, *, bq: int, n_q: int,
                 scale2: float, nat_scale: float, mask_mode: str,
                 clamp: bool):
    """Fused backward: one pass over (q block i, kv block j) produces dq,
    dk AND dv, sharing the recomputed p and dp that the split _dq_kernel /
    _dkv_kernel each rebuilt (7 -> 5 matmuls per (i, j) pair per head).
    Opt-in via EGOM2P_F64T_FUSED_BWD=1: the on-chip sweep measured it
    SLOWER than the split passes at every block size (see _bwd below),
    so it ships as an A/B reference implementation, not the default.

    Grid is (B, head-pair, kv block j) with j fastest; dq's output block
    maps to the SAME (b, h) block for every j, so it stays VMEM-resident
    as an fp32 accumulator across the sequential j steps (zeroed at j==0,
    written back when the (b, h) block changes)."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        dq_ref[...] = jnp.zeros_like(dq_ref)

    kblk = k_ref[0]  # (bk, 128)
    vblk = v_ref[0]
    bk = kblk.shape[0]
    if mask_mode == "kp":
        bias = bias_ref[0, 0].reshape(1, bk)
    elif mask_mode == "seg":
        seg_k = bias_ref[0, 0].reshape(1, bk)

    def q_step(i, carry):
        dk_a, dk_b, dv_a, dv_b = carry
        q = q_ref[0, pl.ds(i * bq, bq), :]
        do = do_ref[0, pl.ds(i * bq, bq), :]
        qa, qb = q[:, :64], q[:, 64:]
        doa, dob = do[:, :64], do[:, 64:]
        l2_a = l2_ref[0, 0, 0, pl.ds(i * bq, bq)].reshape(bq, 1)
        l2_b = l2_ref[0, 0, 1, pl.ds(i * bq, bq)].reshape(bq, 1)
        d_a = d_ref[0, 0, 0, pl.ds(i * bq, bq)].reshape(bq, 1)
        d_b = d_ref[0, 0, 1, pl.ds(i * bq, bq)].reshape(bq, 1)
        dn = (((1,), (1,)), ((), ()))
        s_a = jax.lax.dot_general(qa, kblk[:, :64], dn,
                                  preferred_element_type=jnp.float32) * scale2
        s_b = jax.lax.dot_general(qb, kblk[:, 64:], dn,
                                  preferred_element_type=jnp.float32) * scale2
        if mask_mode == "kp":
            s_a = s_a + bias
            s_b = s_b + bias
        elif mask_mode == "seg":
            seg_q = segq_ref[0, 0, pl.ds(i * bq, bq)].reshape(bq, 1)
            bias_sq = jnp.where(seg_q != seg_k, _NEG_INF, 0.0)
            s_a = s_a + bias_sq
            s_b = s_b + bias_sq
        if clamp:  # mirror the clamp-only forward (see _dq_kernel)
            s_a = jnp.minimum(s_a, 80.0)
            s_b = jnp.minimum(s_b, 80.0)
        p_a = jnp.exp2(s_a - l2_a)
        p_b = jnp.exp2(s_b - l2_b)
        tn = (((0,), (0,)), ((), ()))
        dv_a = dv_a + jax.lax.dot_general(p_a.astype(doa.dtype), doa, tn,
                                          preferred_element_type=jnp.float32)
        dv_b = dv_b + jax.lax.dot_general(p_b.astype(dob.dtype), dob, tn,
                                          preferred_element_type=jnp.float32)
        dp_a = jax.lax.dot_general(doa, vblk[:, :64], dn,
                                   preferred_element_type=jnp.float32)
        dp_b = jax.lax.dot_general(dob, vblk[:, 64:], dn,
                                   preferred_element_type=jnp.float32)
        ds_a = (p_a * (dp_a - d_a)).astype(qa.dtype)
        ds_b = (p_b * (dp_b - d_b)).astype(qb.dtype)
        dk_a = dk_a + jax.lax.dot_general(ds_a, qa, tn,
                                          preferred_element_type=jnp.float32)
        dk_b = dk_b + jax.lax.dot_general(ds_b, qb, tn,
                                          preferred_element_type=jnp.float32)
        # dq accumulation: read-modify-write the VMEM-resident fp32 block
        dq_a = jnp.dot(ds_a, kblk[:, :64],
                       preferred_element_type=jnp.float32)
        dq_b = jnp.dot(ds_b, kblk[:, 64:],
                       preferred_element_type=jnp.float32)
        rows = pl.ds(i * bq, bq)
        dq_ref[0, rows, :] = (dq_ref[0, rows, :]
                              + jnp.concatenate([dq_a, dq_b], axis=-1)
                              * nat_scale)
        return dk_a, dk_b, dv_a, dv_b

    z = jnp.zeros((bk, 64), jnp.float32)
    dk_a, dk_b, dv_a, dv_b = jax.lax.fori_loop(0, n_q, q_step, (z, z, z, z))
    dk_ref[0] = (jnp.concatenate([dk_a, dk_b], axis=-1)
                 * nat_scale).astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate([dv_a, dv_b], axis=-1).astype(dv_ref.dtype)


# ------------------------------------------------------------------ wrapper
def _blocks(n: int, default: int, env: str) -> int:
    b = int(os.environ.get(env, "0")) or default
    return min(b, max(128, n + (-n % 128)))


_SEG_Q_PAD = -7777.0  # distinct q/k pad sentinels: pad rows match nothing
_SEG_K_PAD = -9999.0


def _prep(q, k, kv_blocked, segments, bq, bk):
    """Returns (Np, Mp, mask_mode, bias (B,1,Mp|128), seg_q (B,1,Np))."""
    B, N, C = q.shape
    M = k.shape[1]
    Np = N + (-N % bq)
    Mp = M + (-M % bk)
    if segments is not None:
        seg = segments.astype(jnp.float32)
        seg_k = jnp.concatenate(
            [seg, jnp.full((B, Mp - M), _SEG_K_PAD, jnp.float32)], axis=1
        ) if Mp != M else seg
        seg_q = jnp.concatenate(
            [seg, jnp.full((B, Np - N), _SEG_Q_PAD, jnp.float32)], axis=1
        ) if Np != N else seg
        return Np, Mp, "seg", seg_k[:, None], seg_q[:, None]
    seg_q = jnp.zeros((B, 1, Np), jnp.float32)  # unread placeholder
    if kv_blocked is not None or Mp != M:
        blocked = (jnp.zeros((B, M), bool) if kv_blocked is None
                   else kv_blocked)
        blocked = _pad_axis(blocked, Mp, 1) | (
            jnp.arange(Mp, dtype=jnp.int32)[None] >= M)
        bias = jnp.where(blocked, _NEG_INF, 0.0).astype(jnp.float32)[:, None]
        return Np, Mp, "kp", bias, seg_q
    return Np, Mp, "none", jnp.zeros((B, 1, 128), jnp.float32), seg_q


@functools.partial(jax.jit,
                   static_argnames=("bq", "bk", "interpret", "safemax"))
def _fwd(q, k, v, kv_blocked, segments, bq: int, bk: int, interpret: bool,
         safemax: bool = True):
    from jax.experimental.pallas import tpu as pltpu
    B, N, C = q.shape
    M = k.shape[1]
    n_pairs = C // 128
    Np, Mp, mask_mode, bias, seg_q = _prep(q, k, kv_blocked, segments, bq, bk)
    qp = _pad_axis(q.astype(jnp.bfloat16), Np, 1)
    kp = _pad_axis(k.astype(jnp.bfloat16), Mp, 1)
    vp = _pad_axis(v.astype(jnp.bfloat16), Mp, 1)
    grid = (B, n_pairs, Np // bq)
    kernel = functools.partial(_fwd_kernel, bk=bk, n_kv=Mp // bk,
                               scale=(64 ** -0.5) * _LOG2E,
                               mask_mode=mask_mode, safemax=safemax)
    o, l2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bias.shape[2]), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, h, i: (b, 0, i)),
            pl.BlockSpec((1, bq, 128), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((1, Mp, 128), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((1, Mp, 128), lambda b, h, i: (b, 0, h)),
        ],
        out_specs=[
            pl.BlockSpec((1, bq, 128), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((1, 1, 2, bq), lambda b, h, i: (b, h, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Np, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, n_pairs, 2, Np), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(bias, seg_q, qp, kp, vp)
    return o[:, :N].astype(q.dtype), l2


@functools.partial(jax.jit,
                   static_argnames=("bq", "bk", "interpret", "safemax",
                                    "fused"))
def _bwd(q, k, v, kv_blocked, segments, o, l2, do, bq: int, bk: int,
         interpret: bool, safemax: bool = True, fused: bool = True):
    from jax.experimental.pallas import tpu as pltpu
    B, N, C = q.shape
    M = k.shape[1]
    n_pairs = C // 128
    Np, Mp, mask_mode, bias, seg_q = _prep(q, k, kv_blocked, segments, bq, bk)
    qp = _pad_axis(q.astype(jnp.bfloat16), Np, 1)
    kp = _pad_axis(k.astype(jnp.bfloat16), Mp, 1)
    vp = _pad_axis(v.astype(jnp.bfloat16), Mp, 1)
    dop = _pad_axis(do.astype(jnp.bfloat16), Np, 1)
    # D = rowsum(do * o) per head, in the L2 layout (B, n_pairs, 2, Np)
    d = (do.astype(jnp.float32) * o.astype(jnp.float32)).reshape(
        B, N, n_pairs, 2, 64).sum(-1)
    d = _pad_axis(d.transpose(0, 2, 3, 1), Np, 3)

    scale2 = (64 ** -0.5) * _LOG2E
    nat = 64 ** -0.5

    if fused:
        # fused single-pass backward (EGOM2P_F64T_FUSED_BWD=1 opt-in).
        # Shares the recomputed p/dp between dq and dkv (5 matmuls per
        # (i, j) pair vs the split passes' 7) — but the on-chip block
        # sweep shows the split kernels still win: kp 8.75 ms (2048
        # blocks) vs fused-best 10.07 ms (512/512), seg tied at 10.78 ms
        # (same-session, benchmarks/prof_flash64_train_blocks.py).  The
        # 3-output kernel's extra VMEM (fp32 dq accumulator + dk/dv
        # carries) shortens Mosaic's pipelining depth more than the two
        # saved matmuls buy back, so the split passes stay the default.
        bias_spec = (pl.BlockSpec((1, 1, bk), lambda b, h, j: (b, 0, j))
                     if mask_mode != "none" else
                     pl.BlockSpec((1, 1, bias.shape[2]),
                                  lambda b, h, j: (b, 0, 0)))
        dq, dk, dv = pl.pallas_call(
            functools.partial(_dqkv_kernel, bq=bq, n_q=Np // bq,
                              scale2=scale2, nat_scale=nat,
                              mask_mode=mask_mode, clamp=not safemax),
            grid=(B, n_pairs, Mp // bk),
            in_specs=[
                bias_spec,
                pl.BlockSpec((1, 1, Np), lambda b, h, j: (b, 0, 0)),
                pl.BlockSpec((1, Np, 128), lambda b, h, j: (b, 0, h)),
                pl.BlockSpec((1, Np, 128), lambda b, h, j: (b, 0, h)),
                pl.BlockSpec((1, 1, 2, Np), lambda b, h, j: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, 2, Np), lambda b, h, j: (b, h, 0, 0)),
                pl.BlockSpec((1, bk, 128), lambda b, h, j: (b, j, h)),
                pl.BlockSpec((1, bk, 128), lambda b, h, j: (b, j, h)),
            ],
            out_specs=[
                # constant in j -> stays VMEM-resident across the kv loop
                pl.BlockSpec((1, Np, 128), lambda b, h, j: (b, 0, h)),
                pl.BlockSpec((1, bk, 128), lambda b, h, j: (b, j, h)),
                pl.BlockSpec((1, bk, 128), lambda b, h, j: (b, j, h)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((B, Np, C), jnp.float32),
                jax.ShapeDtypeStruct((B, Mp, C), jnp.bfloat16),
                jax.ShapeDtypeStruct((B, Mp, C), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
            interpret=interpret,
        )(bias, seg_q, qp, dop, l2, d, kp, vp)
        return (dq[:, :N].astype(q.dtype), dk[:, :M].astype(k.dtype),
                dv[:, :M].astype(v.dtype))

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, bk=bk, n_kv=Mp // bk, scale2=scale2,
                          nat_scale=nat, mask_mode=mask_mode,
                          clamp=not safemax),
        grid=(B, n_pairs, Np // bq),
        in_specs=[
            pl.BlockSpec((1, 1, bias.shape[2]), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, 1, bq), lambda b, h, i: (b, 0, i)),
            pl.BlockSpec((1, bq, 128), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((1, bq, 128), lambda b, h, i: (b, i, h)),
            pl.BlockSpec((1, 1, 2, bq), lambda b, h, i: (b, h, 0, i)),
            pl.BlockSpec((1, 1, 2, bq), lambda b, h, i: (b, h, 0, i)),
            pl.BlockSpec((1, Mp, 128), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((1, Mp, 128), lambda b, h, i: (b, 0, h)),
        ],
        out_specs=pl.BlockSpec((1, bq, 128), lambda b, h, i: (b, i, h)),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(bias, seg_q, qp, dop, l2, d, kp, vp)

    # in kp/seg modes the kernel reads a bk-sized slice of the bias/seg-k
    # row per kv block; in none mode it never reads bias_ref — keep the
    # placeholder spec within the (B, 1, 128) array bounds
    bias_spec = (pl.BlockSpec((1, 1, bk), lambda b, h, j: (b, 0, j))
                 if mask_mode != "none" else
                 pl.BlockSpec((1, 1, bias.shape[2]), lambda b, h, j: (b, 0, 0)))
    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, bq=bq, n_q=Np // bq, scale2=scale2,
                          nat_scale=nat, mask_mode=mask_mode,
                          clamp=not safemax),
        grid=(B, n_pairs, Mp // bk),
        in_specs=[
            bias_spec,
            pl.BlockSpec((1, 1, Np), lambda b, h, j: (b, 0, 0)),
            pl.BlockSpec((1, Np, 128), lambda b, h, j: (b, 0, h)),
            pl.BlockSpec((1, Np, 128), lambda b, h, j: (b, 0, h)),
            pl.BlockSpec((1, 1, 2, Np), lambda b, h, j: (b, h, 0, 0)),
            pl.BlockSpec((1, 1, 2, Np), lambda b, h, j: (b, h, 0, 0)),
            pl.BlockSpec((1, bk, 128), lambda b, h, j: (b, j, h)),
            pl.BlockSpec((1, bk, 128), lambda b, h, j: (b, j, h)),
        ],
        out_specs=[
            pl.BlockSpec((1, bk, 128), lambda b, h, j: (b, j, h)),
            pl.BlockSpec((1, bk, 128), lambda b, h, j: (b, j, h)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Mp, C), jnp.bfloat16),
            jax.ShapeDtypeStruct((B, Mp, C), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
        interpret=interpret,
    )(bias, seg_q, qp, dop, l2, d, kp, vp)
    return (dq[:, :N].astype(q.dtype), dk[:, :M].astype(k.dtype),
            dv[:, :M].astype(v.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash64_train(q, k, v, kv_blocked_f, segments_f, bq, bk, interpret,
                   safemax, fused=True):
    # kv_blocked_f: (B, M) f32 (1.0 = blocked); segments_f: (B, N) f32 ids —
    # both float so the vjp stays all-float (at most one is non-None)
    kvb = None if kv_blocked_f is None else kv_blocked_f > 0.5
    return _fwd(q, k, v, kvb, segments_f, bq, bk, interpret, safemax)[0]


def _flash64_train_fwd(q, k, v, kv_blocked_f, segments_f, bq, bk, interpret,
                       safemax, fused=True):
    kvb = None if kv_blocked_f is None else kv_blocked_f > 0.5
    o, l2 = _fwd(q, k, v, kvb, segments_f, bq, bk, interpret, safemax)
    return o, (q, k, v, kv_blocked_f, segments_f, o, l2)


def _flash64_train_bwd(bq, bk, interpret, safemax, fused, res, do):
    # the backward recomputes p with the SAME softmax form as the forward:
    # safemax -> p = exp2(s - L2) (exact at any logit magnitude);
    # clamp-only -> p = exp2(min(s, 80) - L2) == p_fwd / l, so forward and
    # gradient stay mutually consistent even past the clamp contract
    q, k, v, kv_blocked_f, segments_f, o, l2 = res
    kvb = None if kv_blocked_f is None else kv_blocked_f > 0.5
    dq, dk, dv = _bwd(q, k, v, kvb, segments_f, o, l2, do, bq, bk, interpret,
                      safemax, fused)
    dkvb = (None if kv_blocked_f is None
            else jnp.zeros_like(kv_blocked_f))
    dseg = None if segments_f is None else jnp.zeros_like(segments_f)
    return dq, dk, dv, dkvb, dseg


_flash64_train.defvjp(_flash64_train_fwd, _flash64_train_bwd)


def flash64_train_attention(
    q: jnp.ndarray,  # (B, N, H*64), H even
    k: jnp.ndarray,  # (B, M, H*64)
    v: jnp.ndarray,  # (B, M, H*64)
    kv_blocked: Optional[jnp.ndarray] = None,  # (B, M) bool, True = blocked
    segments: Optional[jnp.ndarray] = None,  # (B, N) int segment ids, N == M
    interpret: bool = False,
    safemax: Optional[bool] = None,
) -> jnp.ndarray:
    """Differentiable non-causal attention in projection layout.

    Mask forms (mutually exclusive): `kv_blocked` key padding, or
    `segments` same-segment self-attention (ops/attention.py:SegmentMask).

    safemax=None reads EGOM2P_F64T_SAFEMAX (default off = clamp-only
    forward softmax, the contract documented in ops/flash64.py — exact
    while attention logits stay within [-87, +55] nats, which training
    leaves only when already diverging; set EGOM2P_F64T_SAFEMAX=1 to
    restore the classic running-max forward).
    """
    N, M = q.shape[1], k.shape[1]
    if q.shape[-1] % 128:  # explicit raise: survives python -O
        raise ValueError("flash64_train needs an even count of 64-dim heads")
    if segments is not None:
        if kv_blocked is not None: raise ValueError("kv_blocked and segments are exclusive")  # noqa: E701
        if N != M: raise ValueError("segment mode is self-attention only")  # noqa: E701
    # Mode-dependent defaults from the on-chip sweep at B=8, N=M=2048
    # (benchmarks/prof_flash64_train_blocks.py, v5e): key-padding is 27%
    # faster at whole-sequence blocks (8.94 vs 12.23 ms fwd+bwd), segment
    # mode 28% faster at 512/1024 (10.10 vs 14.06 ms) — larger seg blocks
    # pay for the per-block segment-id compare.  EGOM2P_F64T_BQ/BK still
    # override both modes.
    if segments is not None:
        bq = _blocks(N, 512, "EGOM2P_F64T_BQ")
        bk = _blocks(M, 1024, "EGOM2P_F64T_BK")
    else:
        bq = _blocks(N, 2048, "EGOM2P_F64T_BQ")
        bk = _blocks(M, 2048, "EGOM2P_F64T_BK")
    kvb_f = (None if kv_blocked is None
             else kv_blocked.astype(jnp.float32))
    seg_f = None if segments is None else segments.astype(jnp.float32)
    if safemax is None:
        safemax = os.environ.get("EGOM2P_F64T_SAFEMAX", "0") == "1"
    fused = os.environ.get("EGOM2P_F64T_FUSED_BWD", "0") == "1"
    return _flash64_train(q, k, v, kvb_f, seg_f, bq, bk, interpret, safemax,
                          fused)

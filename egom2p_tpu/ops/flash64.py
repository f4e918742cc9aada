"""Inference flash attention specialized for head_dim 64 (Pallas TPU).

Why a custom kernel: EgoM2P's base model has 12 heads of dim 64
(reference: egom2p/models/egom2p_model.py:1054-1074); generation is
attention-bound and the stock flash kernel measured 59 TF/s at the hot
shape (B8 H12 N8704) — 60% of the hd-64 MXU ceiling — with another ~11% of
step time burnt on (B,N,C)<->(B,H,N,hd) layout transposes around it.

This kernel:

  * consumes the projection output layout directly: q/k/v are (B, N, H*64)
    and each grid program handles a *pair* of heads — a 128-lane slice
    [2h*64 : (2h+2)*64] — so HBM blocks are full (8,128) tiles and the
    layout transposes (and their ~114 ms/step of "data formatting")
    disappear entirely;
  * keeps the whole per-(batch, head-pair) K and V resident in VMEM
    (~4.5 MB at N=10k) with the q-block grid index innermost, so Pallas's
    revisiting pipeline fetches KV once per (batch, pair) instead of once
    per q-block — ~17x less K/V HBM traffic at 8704 tokens;
  * masks keys with a precomputed additive f32 bias row (covers key-padding
    and sequence-length padding in one broadcast add per block) instead of
    the stock kernel's per-element segment-id compares, and skips even that
    when the sequence is unmasked and block-aligned;
  * tracks the online softmax in the exp2 domain (the VPU's native
    exponential; ln2 folded into the score scale);
  * drops the online-softmax running max entirely (default;
    `safemax=True` restores it): p = exp2(min(s, 80)) with no shift and
    no accumulator rescale.  The running max is not VPU-expensive per se
    — it SERIALIZES the pipeline (every exp2 waits on a cross-block max
    reduce, and the alpha rescale chains iterations).  Measured at
    B8/H12/N5120 on v5e: 74 TF/s clamp-only vs 57 TF/s running-max
    (+31%); an exp2-free probe gives the same 74-75, i.e. the clamped
    exp2 is fully overlapped with the MXU.

Clamp-only softmax numerics contract: softmax(s)_j = exp2(s_j)/Σexp2(s_i)
is evaluated literally in fp32 (normalization makes the absent max-shift
mathematically irrelevant).  It is exact (to fp32 rounding, like the
shifted form) whenever the row's score RANGE, in exp2 units
(= nats x log2e), lies within [-126, 80]: below -126 fp32 exp2 flushes
to zero — harmless unless the row MAX is that low (a -87-nat max logit,
never seen in practice); above 80 the clamp saturates entries toward
uniform weights instead of overflowing (a +55-nat logit; trained
attention logits run ~10-30 nats).  Blocked/padded keys carry a -1e30
additive bias, so their p underflows to exactly 0, and fully-blocked
rows (l == 0) emit exact zeros — the emptied-CFG convention of
ops.attention.masked_attention.  The l accumulator cannot overflow:
p <= 2^80 and M < 2^15 keeps l < 2^95 << fp32 max.

Numerics otherwise: bf16 matmuls, fp32 scores/accumulator — same contract
as the stock kernel. Non-causal only, forward only (generation never
differentiates; training routes to ops/flash64_train.py's fwd+bwd pair).
"""
from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LOG2E = math.log2(math.e)
_NEG_INF = -1e30


def _block_scores(qa, qb, bias_ref, k_ref, j, *, bk, scale, have_bias):
    """Per-kv-block biased scores, shared by both softmax forms: the paired
    hd-64 contractions plus the additive mask-bias row."""
    dn = (((1,), (1,)), ((), ()))  # contract the 64-dim head axis
    kblk = k_ref[0, pl.ds(j * bk, bk), :]  # (bk, 128)
    s_a = jax.lax.dot_general(qa, kblk[:, :64], dn,
                              preferred_element_type=jnp.float32) * scale
    s_b = jax.lax.dot_general(qb, kblk[:, 64:], dn,
                              preferred_element_type=jnp.float32) * scale
    if have_bias:
        bias = bias_ref[0, 0, pl.ds(j * bk, bk)].reshape(1, bk)
        s_a = s_a + bias
        s_b = s_b + bias
    return s_a, s_b


def _kernel_noshift(bias_ref, q_ref, k_ref, v_ref, o_ref, *, bk: int,
                    n_kv: int, scale: float, have_bias: bool):
    """Clamp-only softmax: p = exp2(min(s, 80)), no running max, no
    accumulator rescale (numerics contract in the module docstring).
    The loop body is dot -> exp2 -> dot with only elementwise VPU work,
    which Mosaic fully overlaps with the MXU: 74 vs 57 TF/s measured."""
    q = q_ref[0]  # (bq, 128) bf16: two heads side by side
    qa, qb = q[:, :64], q[:, 64:]
    bq = q.shape[0]

    def kv_step(j, carry):
        l_a, l_b, acc_a, acc_b = carry
        s_a, s_b = _block_scores(qa, qb, bias_ref, k_ref, j, bk=bk,
                                 scale=scale, have_bias=have_bias)
        p_a = jnp.exp2(jnp.minimum(s_a, 80.0))
        p_b = jnp.exp2(jnp.minimum(s_b, 80.0))
        l_a = l_a + p_a.sum(axis=-1, keepdims=True)
        l_b = l_b + p_b.sum(axis=-1, keepdims=True)
        vblk = v_ref[0, pl.ds(j * bk, bk), :]  # (bk, 128)
        acc_a = acc_a + jnp.dot(p_a.astype(vblk.dtype), vblk[:, :64],
                                preferred_element_type=jnp.float32)
        acc_b = acc_b + jnp.dot(p_b.astype(vblk.dtype), vblk[:, 64:],
                                preferred_element_type=jnp.float32)
        return l_a, l_b, acc_a, acc_b

    init = (jnp.zeros((bq, 1), jnp.float32), jnp.zeros((bq, 1), jnp.float32),
            jnp.zeros((bq, 64), jnp.float32), jnp.zeros((bq, 64), jnp.float32))
    l_a, l_b, acc_a, acc_b = jax.lax.fori_loop(0, n_kv, kv_step, init)
    # Fully-blocked rows (l == 0: every p underflowed through the -1e30
    # bias) emit zeros — the emptied-CFG convention of
    # ops.attention.masked_attention.
    o_a = jnp.where(l_a > 0, acc_a / jnp.where(l_a > 0, l_a, 1.0), 0.0)
    o_b = jnp.where(l_b > 0, acc_b / jnp.where(l_b > 0, l_b, 1.0), 0.0)
    o_ref[0] = jnp.concatenate([o_a, o_b], axis=-1).astype(o_ref.dtype)


def _kernel(bias_ref, q_ref, k_ref, v_ref, o_ref, *, bk: int, n_kv: int,
            scale: float, have_bias: bool):
    q = q_ref[0]  # (bq, 128) bf16: two heads side by side
    qa, qb = q[:, :64], q[:, 64:]
    bq = q.shape[0]

    def kv_step(j, carry):
        m_a, m_b, l_a, l_b, acc_a, acc_b = carry
        s_a, s_b = _block_scores(qa, qb, bias_ref, k_ref, j, bk=bk,
                                 scale=scale, have_bias=have_bias)
        new_m_a = jnp.maximum(m_a, s_a.max(axis=-1, keepdims=True))
        new_m_b = jnp.maximum(m_b, s_b.max(axis=-1, keepdims=True))
        alpha_a = jnp.exp2(m_a - new_m_a)
        alpha_b = jnp.exp2(m_b - new_m_b)
        p_a = jnp.exp2(s_a - new_m_a)
        p_b = jnp.exp2(s_b - new_m_b)
        l_a = l_a * alpha_a + p_a.sum(axis=-1, keepdims=True)
        l_b = l_b * alpha_b + p_b.sum(axis=-1, keepdims=True)
        vblk = v_ref[0, pl.ds(j * bk, bk), :]  # (bk, 128)
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
    # Fully-masked rows emit zeros (emptied-CFG convention of
    # ops.attention.masked_attention).  Detection is via the running max: a
    # row whose every key carried the -1e30 bias never lifts m above it
    # (its p values are exp2(0)=1 garbage until a real key appears; once one
    # does, alpha = exp2(-1e30 - m_new) = 0 washes the garbage out, so only
    # never-unmasked rows need the final kill).
    dead_a = m_a <= _NEG_INF * 0.5
    dead_b = m_b <= _NEG_INF * 0.5
    o_a = jnp.where(dead_a, 0.0, acc_a / jnp.where(l_a > 0, l_a, 1.0))
    o_b = jnp.where(dead_b, 0.0, acc_b / jnp.where(l_b > 0, l_b, 1.0))
    o_ref[0] = jnp.concatenate([o_a, o_b], axis=-1).astype(o_ref.dtype)


def _pad_axis(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _adaptive_block(n: int, candidates, max_waste: float) -> int:
    """Largest block whose padding waste stays under `max_waste`, with an
    equal-padding tiebreak toward the larger block (e.g. n=1707 pads to
    2048 under both 1024 and 512 — prefer 1024: fewer grid programs and
    larger dots, measured ~5% faster at the ROAR decoder-subset shape).

    Measured on v5e (3-step ROAR chain): 1024 kv-blocks beat 512 even at
    ~6% padding waste (fewer loop iterations, larger dots); q-side padding
    is pure extra rows, so it only pays for itself under ~4%."""
    min_pad = min(n + (-n % b) for b in candidates)
    for b in candidates:
        padded = n + (-n % b)
        if padded == min_pad or padded <= n * (1 + max_waste):
            return b
    return candidates[-1]


def _cover_block(n: int, max_block: int = 1024) -> int:
    """Smallest 8-aligned q block covering n in ceil(n/max_block) grid
    programs — i.e. keep the grid as coarse as a max_block split but shave
    the padding to < 8 rows.  The ROAR decoder subset (k=1707) padded to
    2048 under the 1024/512 adaptive rule: 17% of q rows were padding in
    every decoder self/cross attention; cover blocks make that 856x2=1712
    (0.3%).  Encoder lengths that 1024 divides exactly are unchanged.
    EGOM2P_F64_QB=adaptive restores the old rule."""
    blocks = -(-n // max_block)
    per = -(-n // blocks)          # ceil rows per block
    return min(max_block, -(-per // 8) * 8)  # ceil to a sublane multiple


def _divisor_block(n: int, max_block: int) -> int:
    """KV block minimizing padded length, tie-broken toward larger blocks.

    KV is fully VMEM-resident regardless of bk (the block only sets the
    inner-loop dot granularity), so the best bk is the largest
    lane-aligned value that divides the sequence exactly — e.g. 2176 for
    8704, 2304 for 6912, 2560 for 5120 — giving 2-4 loop iterations with
    zero padding, and (when the whole sequence is unmasked) skipping the
    bias add entirely because Mp == M.  Measured on v5e (3-step ROAR
    chain): 1831 ms vs 2004 ms with 1024/512 adaptive kv-blocks (-8.6%);
    pushing blocks past 2560 (fewer, larger dots) regressed step 1 and
    was a net wash."""
    best = (None, None, 512)
    for b in range(512, max_block + 1, 128):
        padded = n + (-n % b)
        key = (padded, -b)
        if best[0] is None or key < (best[0], best[1]):
            best = (padded, -b, b)
    return best[2]


def flash64_attention(
    q: jnp.ndarray,  # (B, N, H*64), H even
    k: jnp.ndarray,  # (B, M, H*64)
    v: jnp.ndarray,  # (B, M, H*64)
    kv_blocked: Optional[jnp.ndarray] = None,  # (B, M) bool, True = blocked
    bq: int = 0,
    bk: int = 0,
    interpret: bool = False,
    safemax: Optional[bool] = None,
) -> jnp.ndarray:
    """Non-causal attention in projection layout; returns (B, N, H*64).

    bq/bk = 0 picks per-shape blocks: adaptive q blocks (_adaptive_block)
    and exact-divisor kv blocks (_divisor_block).

    safemax=None reads EGOM2P_F64_SAFEMAX (default off = the clamp-only
    softmax; see the module docstring for its numerics contract).  Pass
    True for the classic running-max online softmax — needed only if a
    caller's score range can leave [-126, 80] exp2 units."""
    # env defaults resolve OUTSIDE the jitted core so the jit cache keys on
    # the resolved values: a later in-process env flip then retraces (a
    # read inside the core would be baked into the safemax=None cache entry
    # and the flip silently ignored)
    import os
    N, M = q.shape[1], k.shape[1]
    if not bq:
        if os.environ.get("EGOM2P_F64_QB", "cover") == "adaptive":
            bq = _adaptive_block(N, (1024, 512), 0.04)
        else:
            bq = _cover_block(N)
    if not bk:
        bk = _divisor_block(M, int(os.environ.get("EGOM2P_F64_MAXBK",
                                                  "2560")))
    if safemax is None:
        safemax = os.environ.get("EGOM2P_F64_SAFEMAX", "0") == "1"
    return _flash64_attention_jit(q, k, v, kv_blocked, bq=bq, bk=bk,
                                  interpret=interpret, safemax=safemax)


@functools.partial(jax.jit,
                   static_argnames=("bq", "bk", "interpret", "safemax"))
def _flash64_attention_jit(q, k, v, kv_blocked, bq: int, bk: int,
                           interpret: bool, safemax: bool):
    B, N, C = q.shape
    M = k.shape[1]
    if C % 128: raise ValueError("flash64 needs an even count of 64-dim heads")  # noqa: E701
    n_pairs = C // 128
    bq = min(bq, max(128, N + (-N % 128)))
    bk = min(bk, max(128, M + (-M % 128)))
    Np = N + (-N % bq)
    Mp = M + (-M % bk)
    have_bias = kv_blocked is not None or Mp != M

    # bf16 matmul inputs (same contract as the stock kernel / dense path's
    # bf16 MXU feeds); scores and accumulation stay fp32 inside the kernel
    qp = _pad_axis(q.astype(jnp.bfloat16), Np, 1)
    kp = _pad_axis(k.astype(jnp.bfloat16), Mp, 1)
    vp = _pad_axis(v.astype(jnp.bfloat16), Mp, 1)
    if have_bias:
        if kv_blocked is None:
            blocked = jnp.zeros((B, M), bool)
        else:
            blocked = kv_blocked
        blocked = _pad_axis(blocked, Mp, 1) | (
            jnp.arange(Mp, dtype=jnp.int32)[None] >= M)
        bias = jnp.where(blocked, _NEG_INF, 0.0).astype(jnp.float32)[:, None, :]
    else:
        bias = jnp.zeros((B, 1, 128), jnp.float32)  # unused placeholder

    grid = (B, n_pairs, Np // bq)
    kernel = functools.partial(
        _kernel if safemax else _kernel_noshift, bk=bk, n_kv=Mp // bk,
        scale=(64 ** -0.5) * _LOG2E, have_bias=have_bias)
    from jax.experimental.pallas import tpu as pltpu

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, bias.shape[2]), lambda b, h, i: (b, 0, 0)),
            pl.BlockSpec((1, bq, 128), lambda b, h, i: (b, i, h)),
            # K/V index maps ignore the (innermost) q index: Pallas fetches
            # them once per (batch, head-pair) and reuses across q blocks
            pl.BlockSpec((1, Mp, 128), lambda b, h, i: (b, 0, h)),
            pl.BlockSpec((1, Mp, 128), lambda b, h, i: (b, 0, h)),
        ],
        out_specs=pl.BlockSpec((1, bq, 128), lambda b, h, i: (b, i, h)),
        out_shape=jax.ShapeDtypeStruct((B, Np, C), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            # VMEM-resident KV (Mp*128*2B*2 per program) + double-buffered
            # q/o blocks; the default 16MB scoped limit is too tight past
            # Mp ~ 6k
            vmem_limit_bytes=96 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(bias, qp, kp, vp)
    return out[:, :N].astype(q.dtype)

"""Functional EMA vector quantization (lucidrains-style), TPU-native.

Reimplements the cosine-sim / euclidean EMA codebooks of the reference
(reference: egom2p/vq/quantizers/quantize_lucid.py:181-428) as pure functions
over an explicit `VQState`, which makes the in-place EMA buffer mutations and
distributed codebook sync jit-compatible:

  * the reference's `torch.distributed.all_reduce` of cluster sizes and embed
    sums (quantize_lucid.py:91-135, 208-210) becomes `jax.lax.psum` over a
    mesh axis inside the (shard_map'd / pjit'd) train step,
  * dead-code expiry with the `batch_random` policy (quantize_lucid.py:235-237)
    becomes a functional gather of random batch latents,
  * kmeans init (data-dependent iteration count) is provided as a host-side
    helper to run once before jit, like the reference's lazy `init_embed_`.

The main model's cam/gaze tokenizers use the cosine-sim variant
(norm_codes=True, reference: egom2p/vq/vqvae.py:171-185).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class VQState(NamedTuple):
    embed: jnp.ndarray         # (K, D) codebook
    cluster_size: jnp.ndarray  # (K,) EMA usage counts
    initted: jnp.ndarray       # () bool — False until kmeans init ran
    # (K, D) EMA of assigned-latent SUMS, used by the euclidean codebook
    # (reference keeps a separate embed_avg buffer, quantize_lucid.py:294-297);
    # None on cosine-sim states and checkpoints that predate the field
    embed_avg: Optional[jnp.ndarray] = None


class VQConfig(NamedTuple):
    codebook_size: int = 256
    dim: int = 32
    decay: float = 0.99
    eps: float = 1e-5
    threshold_ema_dead_code: float = 0.25
    commitment_weight: float = 1.0
    use_cosine_sim: bool = True
    norm_latents: bool = False
    kmeans_init: bool = False
    # 'batch_random' | 'linde_buzo_gray' (reference: quantize_lucid.py:245-261)
    code_replacement_policy: str = "batch_random"


def l2norm(t, eps=1e-12):
    return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), eps)


def init_vq_state(cfg: VQConfig, rng: jax.Array) -> VQState:
    if cfg.kmeans_init:
        embed = jnp.zeros((cfg.codebook_size, cfg.dim), jnp.float32)
        initted = jnp.zeros((), bool)
    else:
        # kaiming-uniform like the reference's uniform_init
        # (quantize_lucid.py:41-44)
        bound = jnp.sqrt(3.0) * jnp.sqrt(2.0 / cfg.dim)
        embed = jax.random.uniform(
            rng, (cfg.codebook_size, cfg.dim), jnp.float32, -bound, bound)
        if cfg.use_cosine_sim:
            embed = l2norm(embed)
        initted = jnp.ones((), bool)
    embed_avg = None if cfg.use_cosine_sim else embed
    return VQState(embed_avg=embed_avg,
                   embed=embed, cluster_size=jnp.zeros((cfg.codebook_size,), jnp.float32),
                   initted=initted)


def kmeans_init_state(cfg: VQConfig, samples: jnp.ndarray, rng: jax.Array,
                      num_iters: int = 10) -> VQState:
    """Host-side kmeans codebook init (reference: quantize_lucid.py:137-167).
    `samples` is (N, D) latents gathered from the first batch(es)."""
    if cfg.use_cosine_sim:
        samples = l2norm(samples)
    n = samples.shape[0]
    idx = jax.random.permutation(rng, n)[: cfg.codebook_size]
    means = samples[idx]
    for _ in range(num_iters):
        if cfg.use_cosine_sim:
            dists = samples @ means.T
        else:
            dists = -jnp.sum((samples[:, None] - means[None]) ** 2, axis=-1)
        buckets = jnp.argmax(dists, axis=-1)
        bins = jnp.bincount(buckets, length=cfg.codebook_size).astype(jnp.float32)
        zero = bins == 0
        sums = jax.ops.segment_sum(samples, buckets, cfg.codebook_size)
        new_means = sums / jnp.maximum(bins, 1.0)[:, None]
        if cfg.use_cosine_sim:
            new_means = l2norm(new_means)
        means = jnp.where(zero[:, None], means, new_means)
    return VQState(embed=means, cluster_size=bins, initted=jnp.ones((), bool),
                   embed_avg=(None if cfg.use_cosine_sim
                              else means * jnp.maximum(bins, 1.0)[:, None]))


def vq_lookup(cfg: VQConfig, state: VQState, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-code lookup.  x: (..., D) -> (quantized (..., D), indices (...))."""
    flat = x.reshape(-1, cfg.dim).astype(jnp.float32)
    if cfg.use_cosine_sim:
        flat_n = l2norm(flat)
        embed_n = l2norm(state.embed)
        dist = flat_n @ embed_n.T
    else:
        dist = -(
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2 * flat @ state.embed.T
            + jnp.sum(state.embed**2, axis=1)[None]
        )
    ind = jnp.argmax(dist, axis=-1)
    quant = jnp.take(state.embed, ind, axis=0)
    return quant.reshape(x.shape), ind.reshape(x.shape[:-1])


def vq_forward(
    cfg: VQConfig,
    state: VQState,
    x: jnp.ndarray,                      # (..., D) latents (post quant_proj)
    *,
    training: bool = False,
    rng: Optional[jax.Array] = None,     # for dead-code replacement
    axis_name: Optional[str] = None,     # psum axis for distributed sync
):
    """Quantize latents; optionally compute the functional EMA codebook update.

    Returns (quantized_st, commit_loss, indices, new_state).
    Straight-through estimator and commitment loss follow
    reference: quantize_lucid.py:533-543.
    """
    if cfg.norm_latents:
        x = l2norm(x)
    quant, ind = vq_lookup(cfg, state, x)

    commit_loss = jnp.zeros((), jnp.float32)
    new_state = state
    if training:
        commit_loss = jnp.mean(
            (jax.lax.stop_gradient(quant) - x.astype(jnp.float32)) ** 2
        ) * cfg.commitment_weight

        flat = x.reshape(-1, cfg.dim).astype(jnp.float32)
        if cfg.use_cosine_sim:
            flat = l2norm(flat)
        flat = jax.lax.stop_gradient(flat)
        ind_flat = ind.reshape(-1)
        onehot_sum = jnp.bincount(ind_flat, length=cfg.codebook_size).astype(jnp.float32)
        embed_sum = jax.ops.segment_sum(flat, ind_flat, cfg.codebook_size)
        if axis_name is not None:
            onehot_sum = jax.lax.psum(onehot_sum, axis_name)
            embed_sum = jax.lax.psum(embed_sum, axis_name)

        decay = cfg.decay
        cluster_size = state.cluster_size * decay + onehot_sum * (1 - decay)

        if cfg.use_cosine_sim:
            # (reference: quantize_lucid.py:409-426)
            zero = onehot_sum == 0
            denom = jnp.where(zero, 1.0, onehot_sum)
            embed_normalized = l2norm(embed_sum / denom[:, None])
            embed_normalized = jnp.where(zero[:, None], state.embed, embed_normalized)
            embed = state.embed * decay + embed_normalized * (1 - decay)
        else:
            # (reference: quantize_lucid.py:286-298): embed_avg is an EMA of
            # assigned-latent SUMS; the codebook is embed_avg divided by the
            # laplace-smoothed EMA counts.  Numerator and denominator decay
            # together, so an unused code HOLDS its position instead of
            # shrinking toward the origin.
            avg_prev = (state.embed_avg if state.embed_avg is not None
                        else state.embed * jnp.maximum(
                            state.cluster_size, 1.0)[:, None])
            embed_avg = avg_prev * decay + embed_sum * (1 - decay)
            n = cluster_size.sum()
            smoothed = (cluster_size + cfg.eps) / (n + cfg.codebook_size * cfg.eps) * n
            embed = embed_avg / jnp.maximum(smoothed, 1e-9)[:, None]

        # dead-code expiry (reference: quantize_lucid.py:245-261, 370-386)
        if cfg.threshold_ema_dead_code > 0 and rng is not None:
            expired = cluster_size < cfg.threshold_ema_dead_code
            if cfg.code_replacement_policy == "batch_random":
                # replace dead codes by random latents from the GLOBAL batch:
                # with a mesh axis, sampling from the local shard would give
                # each device different replacements and silently desync the
                # replicated codebook (reference all-gathers,
                # quantize_lucid.py:110-124); rng is identical across devices
                pool = flat
                if axis_name is not None:
                    pool = jax.lax.all_gather(flat, axis_name)
                    pool = pool.reshape(-1, flat.shape[-1])
                repl_idx = jax.random.randint(rng, (cfg.codebook_size,), 0,
                                              pool.shape[0])
                repl = pool[repl_idx]
            elif cfg.code_replacement_policy == "linde_buzo_gray":
                # Linde-Buzo-Gray splitting: dead code i takes the i-th
                # most-used code plus tiny noise (reference:
                # quantize_lucid.py:239-243); rank computed functionally so
                # the whole update stays jit-compatible
                order = jnp.argsort(-cluster_size)
                rank = jnp.clip(jnp.cumsum(expired.astype(jnp.int32)) - 1,
                                0, cfg.codebook_size - 1)
                src = jnp.take(order, rank)
                noise = jax.random.normal(
                    rng, (cfg.codebook_size, cfg.dim)) * 1e-10
                repl = jnp.take(embed, src, axis=0) + noise
            else:
                raise ValueError(cfg.code_replacement_policy)
            if cfg.use_cosine_sim:
                repl = l2norm(repl)
            embed = jnp.where(expired[:, None], repl, embed)

        new_state = VQState(embed=embed, cluster_size=cluster_size,
                            initted=jnp.ones((), bool),
                            embed_avg=(None if cfg.use_cosine_sim
                                       else embed_avg))

    # straight-through
    quant = quant.astype(x.dtype)
    quant_st = x + jax.lax.stop_gradient(quant - x) if training else quant
    return quant_st, commit_loss, ind, new_state


def indices_to_embedding(state: VQState, indices: jnp.ndarray) -> jnp.ndarray:
    """Codebook lookup for decode_tokens (reference: quantize_lucid.py:499-506)."""
    return jnp.take(state.embed, indices, axis=0)

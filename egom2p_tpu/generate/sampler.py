"""Generation sampler: ROAR / MaskGIT / autoregressive with CFG, TPU-native.

Equivalent of the reference GenerationSampler
(reference: egom2p/models/generate.py:323-1097) restructured for XLA:

  * mod-dict tensors/masks live on host as numpy between steps (they are tiny
    token grids); each schedule step invokes one jitted forward,
  * classifier-free guidance runs cond + uncond stacked in a single 2B-batch
    forward instead of two sequential passes (reference: generate.py:789-802
    does a deepcopy + second forward),
  * the encoder keep-count is padded to a bucket so a whole ROAR/MaskGIT chain
    compiles only a handful of programs, all cached after the first clip,
  * fully-masked (empty) conditioning produces exactly-zero attention output,
    matching the reference's zero-length-encoder semantics.
"""
from __future__ import annotations

import copy
import functools
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from egom2p_tpu.data.modality_info import MODALITY_INFO
from egom2p_tpu.models.egom2p import EgoM2P
from egom2p_tpu.ops.attention import inference_attention

SEQ_TYPES = ("seq", "seq_emb", "seq_token")


# --------------------------------------------------------------- init helpers
def empty_img_modality(d):
    """(reference: generate.py:30-37)"""
    d["input_mask"][:] = True
    d["target_mask"][:] = False
    return d


def empty_seq_modality(d, s1_id=5):
    """(reference: generate.py:39-63)"""
    d["tensor"][:] = 0
    d["tensor"][:, [0, 1]] = s1_id
    d["tensor"][:, -1] = s1_id + 1
    d["input_mask"][:] = True
    d["input_mask"][:, 0] = False
    d["target_mask"] = ~d["input_mask"]
    d["decoder_attention_mask"][:] = 1
    d["decoder_attention_mask"][:, 0] = 0
    return d


def empty_seq_emb_modality(d):
    """Empty T5/CLIP-embedding conditioning for CFG: zeroed embeddings with a
    single live (unmasked) slot — the uncond branch must still contribute one
    conditioning token or guidance degenerates
    (reference: generate.py:65-80)."""
    d["tensor"][:] = 0
    d["input_mask"][:] = True
    d["input_mask"][:, 0] = False
    d["target_mask"][:] = True
    d["decoder_attention_mask"][:] = 0
    return d


def init_empty_target_modality(mod_dict, modality_info, domain, batch_size,
                               num_tokens):
    """(reference: generate.py:83-115)"""
    if modality_info[domain]["type"] in ("img", "gaze", "cam", "keypoints"):
        mod_dict[domain] = {
            "tensor": np.zeros((batch_size, num_tokens), dtype=np.int32),
            "input_mask": np.ones((batch_size, num_tokens), dtype=bool),
            "target_mask": np.zeros((batch_size, num_tokens), dtype=bool),
            "decoder_attention_mask": np.zeros((batch_size, num_tokens), dtype=np.int32),
        }
        empty_img_modality(mod_dict[domain])
    elif modality_info[domain]["type"] in SEQ_TYPES:
        num_tokens = max(num_tokens, 2)
        is_emb = modality_info[domain]["type"] == "seq_emb"
        # seq_emb carries float embeddings, not token ids; allocate the
        # (B, N, E) tensor the embedder expects (the reference zeroes an
        # existing tensor via zeros_like, generate.py:66-67)
        tensor = (np.zeros((batch_size, num_tokens,
                            modality_info[domain].get("orig_emb_dim", 4096)),
                           dtype=np.float32) if is_emb
                  else np.zeros((batch_size, num_tokens), dtype=np.int32))
        mod_dict[domain] = {
            "tensor": tensor,
            "input_mask": np.ones((batch_size, num_tokens), dtype=bool),
            "target_mask": np.zeros((batch_size, num_tokens), dtype=bool),
            "decoder_attention_mask": np.zeros((batch_size, num_tokens), dtype=np.int32),
        }
        # seq_emb -> empty_seq_emb_modality (reference: generate.py:108-111)
        (empty_seq_emb_modality if is_emb
         else empty_seq_modality)(mod_dict[domain])
    else:
        raise ValueError(domain)
    return mod_dict


def init_full_input_modality(mod_dict, modality_info, domain, eos_id=3):
    """(reference: generate.py:117-152)"""
    d = mod_dict[domain]
    mtype = modality_info[domain]["type"]
    if mtype == "seq_emb":
        # T5 embeddings ship a validity mask alongside the float tensor
        # (reference: generate.py:146-151)
        valid = np.asarray(d["mask_valid"], dtype=bool)
        d["input_mask"] = ~valid
        d["target_mask"] = np.ones_like(valid)
        d["decoder_attention_mask"] = np.zeros(valid.shape, dtype=np.int32)
        return mod_dict
    shape = d["tensor"].shape
    d.setdefault("input_mask", np.zeros(shape, dtype=bool))
    d.setdefault("target_mask", np.ones(shape, dtype=bool))
    d.setdefault("decoder_attention_mask", np.zeros(shape, dtype=np.int32))
    if mtype in ("img", "cam", "gaze", "keypoints"):
        d["input_mask"][:] = False
        d["target_mask"][:] = True
    elif mtype in ("seq", "seq_token"):
        t = d["tensor"]
        if (t == eos_id).any():
            eos_idx = int(np.where(t == eos_id)[1][0])
        else:
            t[:, 0] = eos_id
            eos_idx = 0
        d["input_mask"][:, : eos_idx + 1] = False
        d["input_mask"][:, eos_idx + 1:] = True
        d["target_mask"][:] = True
    return mod_dict


def expand_to_batch(mod_dict, batch_size):
    """(reference: generate.py:185-195)"""
    for mod, d in mod_dict.items():
        for k, v in d.items():
            if v.shape[0] == 1:
                d[k] = np.repeat(v, batch_size, axis=0)
            elif v.shape[0] != batch_size:
                raise ValueError(f"bad batch dim for {mod}/{k}")
    return mod_dict


# ------------------------------------------------------------------ sampling
# Candidate set cap for sort-free nucleus sampling.  128 covers any realistic
# top-p nucleus (a trained model's 0.8-nucleus at temp<=1 is a handful of
# tokens; even a uniform-over-128 tail carries p<0.8% error mass) and
# approx_max_k's aggregation sort is the dominant sampling cost at 64k
# vocab: 256 -> 128 measured -1.4% on the whole ROAR chain (round 5);
# 256 -> 1024 was 4x slower (169 -> 55 ms per 16x427 rows, round 3).
# EGOM2P_EXACT_TOPK=1 restores the exact full-sort semantics.
_TOPP_TRUNC = 128


def _top_candidates(logits, K):
    """Top-K candidates, sorted descending.  Uses the TPU-optimized
    approximate max-k (~3x faster than exact top_k at 64k vocab; with
    aggregate_to_topk the returned set is exactly sorted and recall is
    ~recall_target on the tail, which nucleus sampling never reaches).
    The scan runs in bf16 (halves the HBM read of the 64k-vocab logits);
    selected candidate values are returned in fp32 for the softmax.

    EGOM2P_EXACT_TOPK=1 kill-switch: exact fp32 lax.top_k, matching the
    reference's exact sort semantics bit-for-bit at the cost of ~3x the
    sampling-step time (reference: egom2p/models/generate.py:332-360).
    """
    import os
    if os.environ.get("EGOM2P_EXACT_TOPK", "0") == "1":
        vals, idxs = jax.lax.top_k(logits.astype(jnp.float32), K)
        return vals, idxs
    try:
        # recall_target tunes approx_max_k's bucket count; 0.85 is 3x faster
        # than the 0.95 default at 64k vocab (32ms vs 107ms per ROAR step at
        # batch 16) and only thins the far tail of the candidate set — the
        # top few hundred values virtually always win their buckets.
        vals, idxs = jax.lax.approx_max_k(logits.astype(jnp.bfloat16), K,
                                          recall_target=0.85)
    except Exception:  # pragma: no cover - older backends
        vals, idxs = jax.lax.top_k(logits, K)
    return vals.astype(jnp.float32), idxs


def _candidate_count(V: int, temperature: float, top_k: float, top_p: float):
    """(k_user, K): user top-k and the candidate-set size sample_tokens uses.

    K == V means no truncation was requested (sample the full vocab)."""
    if abs(temperature) < 1e-10:
        return 0, 1  # greedy: top-1 candidate is the sample
    k_user = 0
    if top_k and top_k > 0:
        k_user = int(top_k) if top_k >= 1 else max(1, int(top_k * V))
    K = min(V, max(k_user, _TOPP_TRUNC) if (top_p and top_p > 0) else
            (k_user or V))
    return k_user, K


def _sample_from_candidates(vals, idxs, key, temperature: float,
                            k_user: int, top_p: float):
    """Categorical sampling over a per-position candidate set.

    vals: (..., K) fp32, sorted descending; idxs: matching global token ids.
    Applies the user top-k cutoff and the nucleus (top-p) cutoff within the
    candidates, then samples (reference: generate.py:332-382)."""
    if abs(temperature) < 1e-10:
        samples = idxs[..., 0].astype(jnp.int32)
        return samples, jnp.ones(samples.shape, jnp.float32)

    if k_user and k_user < vals.shape[-1]:
        pos = jnp.arange(vals.shape[-1])
        vals = jnp.where(pos >= k_user, -jnp.inf, vals)

    if top_p and top_p > 0.0:
        p = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(p, axis=-1)
        # shift right so the first token above the threshold is kept
        # (reference: generate.py:350-353)
        remove = jnp.concatenate(
            [jnp.zeros_like(cum[..., :1], dtype=bool), cum[..., :-1] > top_p],
            axis=-1)
        vals = jnp.where(remove, -jnp.inf, vals)

    probs = jax.nn.softmax(vals / temperature, axis=-1)
    choice = jax.random.categorical(key, vals / temperature, axis=-1)
    sampled = jnp.take_along_axis(probs, choice[..., None], axis=-1)[..., 0]
    samples = jnp.take_along_axis(idxs, choice[..., None],
                                  axis=-1)[..., 0].astype(jnp.int32)
    return samples, sampled


def sample_tokens(logits: jnp.ndarray, key, temperature: float,
                  top_k: float, top_p: float):
    """Top-k / top-p (nucleus) filtering + categorical sampling
    (reference: generate.py:332-382).

    TPU-friendly formulation: instead of a full-vocab sort (prohibitively slow
    for 64k vocab x thousands of positions), take the top `_TOPP_TRUNC`
    candidates with lax.top_k (already sorted descending) and apply the
    nucleus cutoff within them.  For any non-degenerate distribution the
    nucleus is far smaller than the truncation, so this is exact in practice.

    Returns (samples, sampled_probs).
    """
    if abs(temperature) < 1e-10:
        samples = jnp.argmax(logits, axis=-1)
        probs = jnp.ones(samples.shape, jnp.float32)
        return samples, probs

    V = logits.shape[-1]
    k_user, K = _candidate_count(V, temperature, top_k, top_p)

    if K < V or k_user or (top_p and top_p > 0.0):
        # nucleus cutoff needs descending-sorted values, so small vocabs
        # (e.g. 256-code cam/gaze) also go through the candidate path
        vals, idxs = _top_candidates(logits, K)  # sorted descending
        return _sample_from_candidates(vals, idxs, key, temperature,
                                       k_user, top_p)

    # no truncation requested: categorical over the full vocabulary
    probs = jax.nn.softmax(logits / temperature, axis=-1)
    choice = jax.random.categorical(key, logits / temperature, axis=-1)
    sampled = jnp.take_along_axis(probs, choice[..., None], axis=-1)[..., 0]
    return choice, sampled


def chunked_head_sample(model, params, target_mod: str, y, cond_weights,
                        key, temperature: float, top_k: float, top_p: float,
                        vocab_size: int, chunk: int = 256):
    """Vocab head + guidance mix + sampling over POSITION chunks.

    `y`: (G*B, k, dim) decoder hidden states — G stacked guidance branches
    ordered [cond_1, ..., cond_n, uncond] (G=1 when guidance is off).
    `cond_weights`: per-cond-branch guidance weights, mixed EXACTLY in the
    reference's form ``l_uncond + sum_i w_i * (l_cond_i - l_uncond)``
    (generate.py:805, :719-721 — same fp32 rounding, so results are
    bit-identical to the unchunked formulation), or None for G=1.

    Materializing the full (G*B, k, 64000) fp32 logits costs up to ~20 GB of
    HBM and drives XLA into compressed remat copies (~30x slower than the
    matmul itself); chunking positions keeps the live logits buffer at
    (G*B, chunk, V) and reduces each chunk to its top-K candidates
    immediately.  Per-position results are identical to the unchunked form —
    each position's full vocab row lives in exactly one chunk.

    Returns (samples (B, k) int32, sampled_probs (B, k) f32).

    HIDDEN-SPACE GUIDANCE MIX (round 5, default): logits are linear in the
    decoder hidden state (logits = y @ W + b), so
    ``l_u + sum_i w_i (l_c_i - l_u)  ==  (y_u + sum_i w_i (y_c_i - y_u)) @ W + b``
    exactly — mixing the (GB, k, 768) hiddens BEFORE the head computes the
    64k-vocab logits for B rows instead of G*B, halving (G=2) the head
    matmul and the candidate top-k (measured head+sample 50 -> ~27 ms per
    ROAR step).  Same math as the reference's logit mix (generate.py:805,
    719-721); equality holds to the head matmul's bf16 compute precision
    (the model's compute dtype — the same rounding class as every other
    matmul in the net), since bf16(y_mixed) @ W rounds differently than
    mixing bf16-rounded logits.  EGOM2P_CFG_MIX=logits restores the
    literal post-head mix (resolved at trace time: flipping it needs a
    fresh GenerationSampler / jit cache).
    """
    import os
    GB, k, _ = y.shape
    G = 1 if cond_weights is None else len(cond_weights) + 1
    B = GB // G
    if (cond_weights is not None
            and os.environ.get("EGOM2P_CFG_MIX", "hidden") != "logits"):
        yu = y[(G - 1) * B:]
        mixed = yu
        for i, w in enumerate(cond_weights):
            mixed = mixed + w * (y[i * B:(i + 1) * B] - yu)
        y, cond_weights, G = mixed, None, 1
    k_user, K = _candidate_count(vocab_size, temperature, top_k, top_p)
    untruncated = K >= vocab_size and not k_user and not (top_p and top_p > 0)

    # chunk positions; balance the chunk size so padding waste stays under
    # one 8-row MXU tile (k is static per jit cache key — no recompiles)
    n_chunks = max(1, -(-k // chunk))
    per_chunk = -(-k // n_chunks)          # ceil
    chunk = max(8, -(-per_chunk // 8) * 8)  # round up to a tile row
    pad = n_chunks * chunk - k
    if pad:
        y = jnp.pad(y, ((0, 0), (0, pad), (0, 0)))

    vals_parts, idx_parts = [], []
    for c in range(n_chunks):
        yc = jax.lax.dynamic_slice_in_dim(y, c * chunk, chunk, axis=1)
        logits = model.apply(params, target_mod, yc,
                             method=EgoM2P.forward_mod_logits)  # (GB, c, V)
        if G > 1:
            lu = logits[(G - 1) * B:]
            mixed = lu
            for i, w in enumerate(cond_weights):
                mixed = mixed + w * (logits[i * B:(i + 1) * B] - lu)
        else:
            mixed = logits
        if abs(temperature) < 1e-10:
            vals_parts.append(mixed.max(axis=-1, keepdims=True))
            idx_parts.append(
                mixed.argmax(axis=-1, keepdims=True).astype(jnp.int32))
        elif untruncated:
            vals_parts.append(mixed)  # rare: sample the full vocab
            idx_parts.append(None)
        else:
            v, i = _top_candidates(mixed, min(K, vocab_size))
            vals_parts.append(v)
            idx_parts.append(i)

    vals = jnp.concatenate(vals_parts, axis=1)[:, :k]
    if untruncated and abs(temperature) >= 1e-10:
        probs = jax.nn.softmax(vals / temperature, axis=-1)
        choice = jax.random.categorical(key, vals / temperature, axis=-1)
        sampled = jnp.take_along_axis(probs, choice[..., None],
                                      axis=-1)[..., 0]
        return choice.astype(jnp.int32), sampled
    idxs = jnp.concatenate(idx_parts, axis=1)[:, :k]
    return _sample_from_candidates(vals, idxs, key, temperature, k_user,
                                   top_p)


def _bucket(n: int, size: int = 256) -> int:
    return max(size, ((n + size - 1) // size) * size)


def _inference_attn(fn):
    """Trace generation step functions with the inference-attention flag on,
    routing eligible attention to the flash64 kernel (ops/flash64.py)."""
    @functools.wraps(fn)
    def wrapped(*a, **kw):
        with inference_attention():
            return fn(*a, **kw)
    return wrapped


class GenerationSampler:
    """Wraps a trained EgoM2P (module + params) for generation."""

    def __init__(self, model: EgoM2P, params, modality_info=None):
        self.model = model
        self.params = params
        self.info = modality_info or MODALITY_INFO
        self._logits_fns: Dict = {}
        self._ar_fns: Dict = {}

    # ---------------------------------------------------------------- device
    def _step_fn(self, target_mod: str, num_enc: int, k: int, use_cfg: bool,
                 cfg_scale: float, temperature: float, top_k: float,
                 top_p: float):
        """One fully-fused device step: encoder + decoder-subset logits + CFG
        mix + sampling, all inside a single jit so there is exactly one
        dispatch per schedule step (critical when the chip sits behind an RPC
        relay)."""
        cache_key = (target_mod, num_enc, k, use_cfg, float(cfg_scale),
                     float(temperature), float(top_k), float(top_p))
        if cache_key not in self._logits_fns:
            model = self.model

            vocab = self.info[target_mod]["vocab_size"]

            @jax.jit
            def fn(params, mod_dict, ids_keep, key):
                context, enc_mask = model.apply(
                    params, mod_dict, num_enc,
                    method=EgoM2P.forward_enc_context)
                y = model.apply(
                    params, mod_dict, target_mod, context, enc_mask, ids_keep,
                    method=EgoM2P.forward_dec_subset_hidden)  # (B', k, dim)
                # CFG mix lu + s*(lc - lu) (reference: generate.py:805)
                weights = (cfg_scale,) if use_cfg else None
                return chunked_head_sample(model, params, target_mod, y,
                                           weights, key, temperature, top_k,
                                           top_p, vocab)

            self._logits_fns[cache_key] = fn
        return self._logits_fns[cache_key]

    def _fused_img_step_fn(self, target_mod: str, num_enc_c: int,
                           num_enc_u: int, k: int, num_select: int,
                           use_cfg: bool, cfg_scale: float, temperature: float,
                           top_k: float, top_p: float, cond_mods: tuple):
        """Device-resident ROAR/MaskGIT step: encoder (split-shape CFG when
        enabled) + decoder-subset logits + CFG mix + sampling + MaskGIT
        confidence selection + scatter-update of the target modality state,
        in ONE dispatch with NO readback.

        The chain state (tensor/input_mask/target_mask per modality) stays on
        device between steps; the host only chooses positions (`ids_keep`) and
        mirrors the masks, so a 3-step ROAR chain costs exactly one upload,
        three async dispatches, and one final download through the TPU RPC
        relay (round 1 paid per-step uploads + a ~30ms readback per step)."""
        cache_key = ("fused", target_mod, num_enc_c, num_enc_u, k, num_select,
                     use_cfg, float(cfg_scale), float(temperature),
                     float(top_k), float(top_p), cond_mods)
        if cache_key not in self._logits_fns:
            model = self.model

            @jax.jit
            def fn(params, dev, ids_keep, key):
                if use_cfg:
                    un_view = {
                        mod: ({**d,
                               "input_mask": jnp.ones_like(d["input_mask"])}
                              if mod in cond_mods else d)
                        for mod, d in dev.items()
                    }
                    # Split-shape CFG: cond and uncond run at their own
                    # encoder lengths through BOTH the encoder and the
                    # decoder cross-attention — padding the uncond context to
                    # the cond length would waste up to ~60% of the uncond
                    # cross-attn FLOPs on blocked keys.
                    ctx_c, mask_c = model.apply(
                        params, dev, num_enc_c,
                        method=EgoM2P.forward_enc_context)
                    ctx_u, mask_u = model.apply(
                        params, un_view, num_enc_u,
                        method=EgoM2P.forward_enc_context)
                    y_c = model.apply(
                        params, dev, target_mod, ctx_c, mask_c, ids_keep,
                        method=EgoM2P.forward_dec_subset_hidden)
                    y_u = model.apply(
                        params, dev, target_mod, ctx_u, mask_u, ids_keep,
                        method=EgoM2P.forward_dec_subset_hidden)
                    y = jnp.concatenate([y_c, y_u], axis=0)
                else:
                    context, enc_mask = model.apply(
                        params, dev, num_enc_c,
                        method=EgoM2P.forward_enc_context)
                    y = model.apply(
                        params, dev, target_mod, context, enc_mask, ids_keep,
                        method=EgoM2P.forward_dec_subset_hidden)
                # CFG mix lu + s*(lc - lu) (reference: generate.py:805)
                weights = (cfg_scale,) if use_cfg else None
                samples, probs = chunked_head_sample(
                    model, params, target_mod, y, weights, key, temperature,
                    top_k, top_p, self.info[target_mod]["vocab_size"])
                if num_select < k:
                    # MaskGIT: keep the num_select most confident positions
                    # (reference: generate.py:652-665)
                    _, top_idx = jax.lax.top_k(probs, num_select)
                    sel_pos = jnp.take_along_axis(ids_keep, top_idx, axis=1)
                    sel_samples = jnp.take_along_axis(samples, top_idx, axis=1)
                else:
                    sel_pos, sel_samples = ids_keep, samples
                d = dev[target_mod]
                rows = jnp.arange(sel_pos.shape[0])[:, None]
                new_tensor = d["tensor"].at[rows, sel_pos].set(
                    sel_samples.astype(d["tensor"].dtype))
                new_imask = d["input_mask"].at[rows, sel_pos].set(False)
                new_tmask = d["target_mask"].at[rows, sel_pos].set(True)
                return new_tensor, new_imask, new_tmask, sel_pos

            self._logits_fns[cache_key] = fn
        return self._logits_fns[cache_key]

    # ------------------------------------------------------------ host utils
    def _num_enc_tokens(self, mod_dict, exclude: tuple = ()) -> int:
        # Bucketed max-unmasked count (reference computes the dynamic max,
        # generate.py:415).  Buckets of 512 keep the compile count per task at
        # a handful of shapes, all cached persistently; extra slots are
        # fully-masked padding (zeroed embeddings, blocked keys) so results
        # are identical.  `exclude` counts a CFG-uncond view without
        # materializing it (excluded = emptied conditioning modalities).
        total = 0
        for mod in mod_dict:
            if mod in self.model.in_domains and mod not in exclude:
                total += int((~mod_dict[mod]["input_mask"]).sum(axis=1).max())
        return total

    def _make_uncond(self, mod_dict, conditioning: List[str]):
        """(reference: generate.py:792-800)"""
        un = copy.deepcopy(mod_dict)
        for mod in conditioning:
            if self.info[mod]["type"] in ("seq", "seq_token"):
                empty_seq_modality(un[mod])
            elif self.info[mod]["type"] == "seq_emb":
                empty_seq_emb_modality(un[mod])
            else:
                empty_img_modality(un[mod])
        return un

    @staticmethod
    def _stack_dicts(a, b):
        return {
            mod: {k: np.concatenate([a[mod][k], b[mod][k]], axis=0)
                  for k in a[mod]}
            for mod in a
        }

    @staticmethod
    def _to_device(mod_dict):
        return {mod: {k: jnp.asarray(v) for k, v in d.items()}
                for mod, d in mod_dict.items()}

    def _select_positions(self, target_mask: np.ndarray, k: int,
                          rng: np.random.Generator, random_order: bool):
        """Choose k still-to-predict positions per batch row.

        ROAR uses a random tiebreak, MaskGIT a deterministic one
        (reference: generate.py:447-516)."""
        B, L = target_mask.shape
        if random_order:
            tie = rng.random(L)[None, :] * 1e-6
        else:
            tie = np.arange(L, dtype=np.float64)[None, :] * 1e-6
        prio = target_mask.astype(np.float64) + tie
        order = np.argsort(prio, axis=1)
        return order[:, :k].astype(np.int32)

    # ------------------------------------------------------------- gen steps
    def _img_step(self, mod_dict, dev, dirty: set, target_mod: str,
                  scheme: str, num_select: int, temperature: float,
                  top_k: float, top_p: float, conditioning: List[str],
                  cfg_scale: float, rng: np.random.Generator, key,
                  sync_to_host) -> None:
        """One ROAR or MaskGIT step.

        Tensors live on DEVICE in `dev` (chain state, scatter-updated in-jit);
        the host `mod_dict` masks are kept as exact mirrors (ROAR positions
        are host-chosen; MaskGIT's device-side confidence selection is read
        back as a small sel_pos array).  `dirty` tracks modalities whose host
        *tensor* is stale relative to the device.

        Note: during generation, target_mask True == already filled /
        not-to-predict; we predict where target_mask is False
        (reference initializes targets that way, generate.py:30-37)."""
        d = mod_dict[target_mod]
        # positions still to predict: target_mask == False (reference keeps
        # decoder candidates where the target mask is unset, generate.py:460)
        # NOTE row 0 sets the shared per-step k, exactly like the reference's
        # schedule-wide num_tokens: a row with fewer open positions has
        # already-filled positions re-selected and resampled (the reference's
        # argsort-gather does the same, generate.py:460-516) — ragged per-row
        # masking is not a supported inpainting surface in either codebase.
        open_mask = ~d["target_mask"]
        n_remaining = int(open_mask[0].sum())
        if n_remaining == 0:
            return
        use_cfg = cfg_scale != 1.0 and len(conditioning) > 0
        all_img_cond = all(self.info[m]["type"] not in SEQ_TYPES
                           for m in conditioning)

        if scheme == "roar":
            k = min(num_select, n_remaining)
            ids_keep = self._select_positions(~open_mask, k, rng,
                                              random_order=True)
        else:  # maskgit: logits over ALL open positions
            k = n_remaining
            ids_keep = self._select_positions(~open_mask, k, rng,
                                              random_order=False)

        if use_cfg and not all_img_cond:
            # seq-type conditioning needs host-side sentinel rewrites; run the
            # legacy stacked 2B-batch host-resident formulation for it
            sync_to_host()
            uncond = self._make_uncond(mod_dict, conditioning)
            stacked = self._stack_dicts(mod_dict, uncond)
            ids_dev = jnp.asarray(np.concatenate([ids_keep, ids_keep], axis=0))
            num_enc = _bucket(self._num_enc_tokens(stacked))
            fn = self._step_fn(target_mod, num_enc, k, True, cfg_scale,
                               temperature, top_k, top_p)
            samples, probs = fn(self.params, self._to_device(stacked),
                                ids_dev, key)
            B = ids_keep.shape[0]
            samples = np.asarray(samples)[:B]
            probs = np.asarray(probs)[:B]
            if scheme == "maskgit" and num_select < k:
                top_idx = np.argsort(-probs, axis=1)[:, :num_select]
                sel_pos = np.take_along_axis(ids_keep, top_idx, axis=1)
                sel_samples = np.take_along_axis(samples, top_idx, axis=1)
            else:
                sel_pos, sel_samples = ids_keep, samples
            rows = np.arange(B)[:, None]
            d["tensor"][rows, sel_pos] = sel_samples.astype(d["tensor"].dtype)
            d["input_mask"][rows, sel_pos] = False
            d["target_mask"][rows, sel_pos] = True
            # refresh the device mirror of the modality we just changed
            dev[target_mod] = {kk: jnp.asarray(vv) for kk, vv in d.items()}
            return

        num_enc_c = _bucket(self._num_enc_tokens(mod_dict))
        num_enc_u = _bucket(
            self._num_enc_tokens(mod_dict, exclude=tuple(conditioning)),
            256) if use_cfg else 0
        n_sel = num_select if scheme == "maskgit" else k
        fn = self._fused_img_step_fn(
            target_mod, num_enc_c, num_enc_u, k, min(n_sel, k), use_cfg,
            cfg_scale, temperature, top_k, top_p, tuple(sorted(conditioning)))
        new_tensor, new_imask, new_tmask, sel_pos = fn(
            self.params, dev, jnp.asarray(ids_keep), key)
        dev[target_mod] = {**dev[target_mod], "tensor": new_tensor,
                           "input_mask": new_imask, "target_mask": new_tmask}
        dirty.add(target_mod)

        # host mask mirrors (tensor values stay device-side until sync)
        if scheme == "maskgit" and num_select < k:
            sel_np = np.asarray(sel_pos)  # small (B, num_select) readback
        else:
            sel_np = ids_keep  # ROAR fills exactly the chosen ids: no readback
        rows = np.arange(sel_np.shape[0])[:, None]
        d["input_mask"][rows, sel_np] = False
        d["target_mask"][rows, sel_np] = True

    # ------------------------------------------------------- autoregressive
    def _enc_fn(self, num_enc: int):
        if ("enc", num_enc) not in self._ar_fns:
            model = self.model

            @jax.jit
            def fn(params, mod_dict):
                return model.apply(params, mod_dict, num_enc,
                                   method=EgoM2P.forward_enc_context)

            self._ar_fns[("enc", num_enc)] = fn
        return self._ar_fns[("enc", num_enc)]

    def _ar_token_fn(self, target_mod: str, S: int, use_cfg: bool,
                     cfg_scale: float, temperature: float, top_k: float,
                     top_p: float):
        cache_key = ("tok", target_mod, S, use_cfg, cfg_scale, temperature,
                     top_k, top_p)
        if cache_key not in self._ar_fns:
            model = self.model

            @jax.jit
            def fn(params, context, enc_mask, y_emb, out_ids, cur, key):
                logits = model.apply(
                    params, target_mod, out_ids, y_emb, context, enc_mask,
                    method=EgoM2P.forward_dec_autoregressive_logits)
                last = jnp.take_along_axis(
                    logits,
                    jnp.broadcast_to((cur - 1)[None, None, None],
                                     (logits.shape[0], 1, logits.shape[-1])),
                    axis=1)[:, 0]  # (B', V)
                if use_cfg:
                    B = last.shape[0] // 2
                    lc, lu = last[:B], last[B:]
                    last = lu + (lc - lu) * cfg_scale
                samples, _ = sample_tokens(last, key, temperature, top_k, top_p)
                return samples  # (B,)

            self._ar_fns[cache_key] = fn
        return self._ar_fns[cache_key]

    def _seq_step(self, mod_dict, target_mod: str, temperature: float,
                  top_k: float, top_p: float, conditioning: List[str],
                  cfg_scale: float, key, text_tokenizer=None) -> None:
        """Autoregressive sequence decoding with full fixed-shape re-forward
        per token (reference: generate.py:852-1027) and span merging
        (reference: generate.py:552-628)."""
        from egom2p_tpu.masking.span import (get_sentinel_to_id_mapping,
                                             merge_span_masking)
        d = mod_dict[target_mod]
        use_cfg = cfg_scale != 1.0 and len(conditioning) > 0
        if use_cfg:
            stacked = self._stack_dicts(mod_dict,
                                        self._make_uncond(mod_dict, conditioning))
        else:
            stacked = mod_dict
        num_enc = _bucket(self._num_enc_tokens(stacked))
        context, enc_mask = self._enc_fn(num_enc)(
            self.params, self._to_device(stacked))

        # gather target slots in mask-sorted order (deterministic tiebreak,
        # reference: generate.py:518-550)
        tm = d["target_mask"]
        order = np.argsort(tm.astype(np.float64)
                           + np.arange(tm.shape[1])[None] * 1e-6, axis=1)
        S = min(int((~tm[0]).sum()),
                self.info[target_mod]["max_tokens"])
        ids_keep = order[:, :S]
        rows = np.arange(tm.shape[0])[:, None]
        dec_ids = d["tensor"][rows, ids_keep]

        # positional embeddings for the gathered slots, computed on device once
        model = self.model

        @jax.jit
        def emb_fn(params, dd, idx):
            def run(m, dd):
                _, emb, _ = m.decoder_embeddings[target_mod].forward_embed(
                    dd, m._dec_mod_emb[target_mod])
                return emb

            emb = model.apply(params, dd, method=run)
            return jnp.take_along_axis(emb, idx[..., None], axis=1)

        dd_dev = {k: jnp.asarray(np.concatenate([v, v]) if use_cfg else v)
                  for k, v in d.items()}
        idx_dev = jnp.asarray(np.concatenate([ids_keep, ids_keep])
                              if use_cfg else ids_keep)
        y_emb = emb_fn(self.params, dd_dev, idx_dev)

        eos_token = int(dec_ids[0][-1])  # final sentinel (generate.py:875)
        B = tm.shape[0]
        Bp = 2 * B if use_cfg else B
        out = np.zeros((Bp, S), dtype=np.int32)
        out[:, 0] = np.concatenate([dec_ids[:, 0]] * (2 if use_cfg else 1))
        tok_fn = self._ar_token_fn(target_mod, S, use_cfg, cfg_scale,
                                   temperature, top_k, top_p)
        n_gen = 1
        for i in range(1, S):
            key, sub = jax.random.split(key)
            nxt = np.asarray(tok_fn(self.params, context, enc_mask, y_emb,
                                    jnp.asarray(out), jnp.asarray(i), sub))
            out[:B, i] = nxt
            if use_cfg:
                out[B:, i] = nxt
            n_gen = i + 1
            if (out[:B, : i + 1] == eos_token).any(axis=-1).all():
                break

        if text_tokenizer is None:
            # raw-token path: write predictions back into the tensor slots
            d["tensor"][rows, ids_keep[:, :n_gen]] = out[:B, :n_gen]
            d["input_mask"][rows, ids_keep[:, :n_gen]] = False
            d["target_mask"][rows, ids_keep[:, :n_gen]] = True
            return

        # merge predicted spans into the input sequence per batch row
        # (reference: merge_sequences_batched, generate.py:583-628)
        sentinel_ids = set(get_sentinel_to_id_mapping(text_tokenizer).values())
        pad_id = text_tokenizer.token_to_id("[PAD]")
        merged_rows = []
        for b in range(B):
            inp = d["tensor"][b][~d["input_mask"][b]].tolist()
            if not inp:
                inp = [next(iter(sorted(sentinel_ids)))]
            merged_rows.append(merge_span_masking(inp, out[b, :n_gen].tolist(),
                                                  sentinel_ids))
        max_len = max(len(r) for r in merged_rows)
        tensor = np.full((B, max_len), pad_id, dtype=np.int32)
        input_mask = np.ones((B, max_len), dtype=bool)
        for b, r in enumerate(merged_rows):
            tensor[b, : len(r)] = r
            input_mask[b, : len(r)] = False
        mod_dict[target_mod] = {
            "tensor": tensor,
            "input_mask": input_mask,
            "target_mask": np.ones((B, max_len), dtype=bool),
            "decoder_attention_mask": np.zeros((B, max_len), dtype=np.int32),
        }

    # ------------------------------------------------- multi-guided variant
    def _multi_step_fn(self, target_mod: str, num_enc: int, k: int,
                       n_cond: int, weights, temperature: float,
                       top_k: float, top_p: float):
        cache_key = ("multi", target_mod, num_enc, k, n_cond, tuple(weights),
                     temperature, top_k, top_p)
        if cache_key not in self._logits_fns:
            model = self.model
            # conjunction: l_uncond + sum_i w_i (l_cond_i - l_uncond)
            # (reference: generate.py:719-721, arXiv 2206.01714)
            bw = tuple(float(x) for x in weights)
            vocab = self.info[target_mod]["vocab_size"]

            @jax.jit
            def fn(params, mod_dict, ids_keep, key):
                context, enc_mask = model.apply(
                    params, mod_dict, num_enc, method=EgoM2P.forward_enc_context)
                y = model.apply(
                    params, mod_dict, target_mod, context, enc_mask, ids_keep,
                    method=EgoM2P.forward_dec_subset_hidden)
                return chunked_head_sample(model, params, target_mod, y, bw,
                                           key, temperature, top_k, top_p,
                                           vocab)

            self._logits_fns[cache_key] = fn
        return self._logits_fns[cache_key]

    @_inference_attn
    def generate_multi_guided(self, uncond_dict, cond_dicts, schedule,
                              top_k: float = 0.0, top_p: float = 0.0,
                              text_tokenizer=None, verbose: bool = False,
                              seed: Optional[int] = None):
        """Weighted multi-condition generation
        (reference: generate.py:1170-1229).  `cond_dicts` each hold a subset
        of conditioning modalities; schedule steps carry per-condition weight
        lists in cfg_scale."""
        uncond = {m: {k: np.array(v) for k, v in d.items()}
                  for m, d in uncond_dict.items()}
        conds = [{m: {k: np.array(v) for k, v in d.items()} for m, d in c.items()}
                 for c in cond_dicts]
        cur_target = schedule[0]["target_domain"]
        for c in conds:
            c[cur_target] = copy.deepcopy(uncond[cur_target])

        key = jax.random.PRNGKey(seed if seed is not None else 0)
        for step, s in enumerate(schedule):
            target_mod = s["target_domain"]
            if cur_target != target_mod:
                # finished modality becomes an extra condition
                # (reference: generate.py:1192-1210)
                for c in conds:
                    del c[cur_target]
                    c[target_mod] = copy.deepcopy(uncond[target_mod])
                uncond[cur_target]["input_mask"][:] = True
                new_cond = {cur_target: copy.deepcopy(uncond[cur_target]),
                            target_mod: copy.deepcopy(uncond[target_mod])}
                new_cond[cur_target]["input_mask"][:] = False
                new_cond[cur_target]["target_mask"][:] = True
                conds.append(new_cond)
                cur_target = target_mod

            rng = np.random.default_rng((seed or 0) + step)
            key, sub = jax.random.split(key)
            d = uncond[target_mod]
            open_mask = ~d["target_mask"]
            n_remaining = int(open_mask[0].sum())
            if n_remaining == 0:
                continue
            k = min(s["num_tokens"], n_remaining)
            ids_keep = self._select_positions(~open_mask, k, rng,
                                              s["scheme"] == "roar")
            # stack [cond_1..cond_n, uncond]; union of modality keys per dict
            stacked = None
            for c in conds + [uncond]:
                filled = dict(c)
                # pad missing mods in this cond with uncond's (fully masked)
                for m in uncond:
                    if m not in filled:
                        masked = {kk: np.array(vv)
                                  for kk, vv in uncond[m].items()}
                        masked["input_mask"][:] = True
                        filled[m] = masked
                stacked = filled if stacked is None else self._stack_dicts(
                    stacked, filled)
            num_enc = _bucket(self._num_enc_tokens(stacked))
            weights = list(np.atleast_1d(np.asarray(s["cfg_scale"], dtype=float)))
            if len(weights) == 1:
                weights = weights * len(conds)
            while len(weights) < len(conds):  # generated-modality conditions
                weights.append(weights[-1])
            fn = self._multi_step_fn(target_mod, num_enc, k, len(conds),
                                     weights[: len(conds)],
                                     s["temperature"], top_k, top_p)
            ids_dev = jnp.asarray(np.concatenate([ids_keep] * (len(conds) + 1)))
            samples, _ = fn(self.params, self._to_device(stacked), ids_dev, sub)
            B = ids_keep.shape[0]
            samples = np.asarray(samples)[:B]
            rows = np.arange(B)[:, None]
            for dd in [uncond] + conds:
                t = dd[target_mod]
                t["tensor"][rows, ids_keep] = samples.astype(t["tensor"].dtype)
                t["input_mask"][rows, ids_keep] = False
                t["target_mask"][rows, ids_keep] = True
        return uncond

    @_inference_attn
    def generate_sam_dense(self, mod_dict, schedule, text_tokenizer,
                           batch_size: int = 16, key: str = "sam_instance",
                           top_k: float = 0.0, top_p: float = 0.0,
                           seed: Optional[int] = None, verbose: bool = False):
        """Dense SAM-instance prediction: run the sequence generation
        batch_size times in parallel (one shared conditioning, different
        samples) and concatenate the merged span outputs into one long
        instance sequence (reference: generate.py:1231-1274)."""
        from egom2p_tpu.masking.span import (get_sentinel_to_id_mapping,
                                             merge_span_masking)
        mod_dict = {m: {k: np.array(v) for k, v in d.items()}
                    for m, d in mod_dict.items()}
        expanded = expand_to_batch(
            {m: {k: np.array(v) for k, v in d.items()}
             for m, d in mod_dict.items()}, batch_size)
        schedule = [s for s in schedule if s["target_domain"] == key]
        out = self.generate(expanded, schedule, top_k=top_k, top_p=top_p,
                            text_tokenizer=text_tokenizer, seed=seed,
                            verbose=verbose)

        sentinel_ids = set(get_sentinel_to_id_mapping(text_tokenizer).values())
        merged: List[int] = []
        for i in range(batch_size):
            row = out[key]
            inp = row["tensor"][i][~row["input_mask"][i]].tolist()
            tgt = row["tensor"][i][~row["target_mask"][i]].tolist()
            merged.extend(merge_span_masking(inp, tgt, sentinel_ids))
        merged_arr = np.asarray(merged, dtype=np.int32)[None]
        mod_dict[key] = {
            "tensor": merged_arr,
            "input_mask": np.zeros(merged_arr.shape, dtype=bool),
            "target_mask": np.ones(merged_arr.shape, dtype=bool),
            "decoder_attention_mask": np.zeros(merged_arr.shape,
                                               dtype=np.int32),
        }
        return mod_dict

    # ------------------------------------------------------------ public API
    def generate_iter(self, mod_dict, schedule, **kwargs):
        """Step-by-step generator variant (reference: generate.py:1100-1168)."""
        mod_dict = {m: {k: np.array(v) for k, v in d.items()}
                    for m, d in mod_dict.items()}
        for step, s in enumerate(schedule):
            mod_dict = self.generate(mod_dict, [s],
                                     seed=(kwargs.get("seed", 0) or 0) + step,
                                     top_k=kwargs.get("top_k", 0.0),
                                     top_p=kwargs.get("top_p", 0.0),
                                     text_tokenizer=kwargs.get("text_tokenizer"))
            yield mod_dict

    @_inference_attn
    def generate(self, mod_dict, schedule, top_k: float = 0.0,
                 top_p: float = 0.0, text_tokenizer=None, verbose: bool = False,
                 seed: Optional[int] = None):
        """(reference: generate.py:1030-1097).  `mod_dict` is a host dict of
        numpy arrays; returns an updated deep copy."""
        def _host_copy(k, v):
            # an already-on-device tensor stays device-resident (no download);
            # masks must be host numpy for the chain's position logic
            if k == "tensor" and isinstance(v, jax.Array):
                return v
            return np.array(v)

        mod_dict = {m: {k: _host_copy(k, v) for k, v in d.items()}
                    for m, d in mod_dict.items()}
        key = jax.random.PRNGKey(seed if seed is not None else 0)

        # device-resident chain state: tensors stay on device across steps;
        # host only mirrors masks (see _img_step)
        dev = None
        dirty: set = set()

        def sync_to_host():
            # Download ONLY the dirty target tensors: the host mask mirrors
            # are exact (see _img_step), and unchanged device inputs are
            # returned as-is (the reference likewise returns the device
            # mod_dict, generate.py:1030-1097).  Through the dev relay every
            # skipped array saves ~10ms; on a real host it saves a PCIe copy.
            nonlocal dev
            if dev is None:
                return
            for mod in sorted(dirty):
                mod_dict[mod]["tensor"] = np.asarray(
                    jax.device_get(dev[mod]["tensor"]))
            dirty.clear()

        def materialize_host():
            # Host-resident steps (seq targets, the stacked seq-CFG branch)
            # mutate mod_dict tensors in place, so caller-provided
            # device-resident tensors must come down to numpy first.
            sync_to_host()
            for d in mod_dict.values():
                if isinstance(d["tensor"], jax.Array):
                    d["tensor"] = np.asarray(jax.device_get(d["tensor"]))

        for step, s in enumerate(schedule):
            target_mod = s["target_domain"]
            rng = np.random.default_rng(
                (seed + step) if seed is not None else step)
            key, sub = jax.random.split(key)
            mtype = self.info[target_mod]["type"]
            if mtype in ("img", "cam", "gaze", "keypoints"):
                if dev is None:
                    dev = self._to_device(mod_dict)
                self._img_step(
                    mod_dict, dev, dirty, target_mod, s["scheme"],
                    s["num_tokens"], s["temperature"], top_k, top_p,
                    s.get("cfg_cond_domains", []), s.get("cfg_scale", 1.0),
                    rng, sub, materialize_host)
            elif mtype in SEQ_TYPES:
                materialize_host()
                dev = None  # seq merging may change shapes; re-upload lazily
                self._seq_step(
                    mod_dict, target_mod, s["temperature"], top_k, top_p,
                    s.get("cfg_cond_domains", []), s.get("cfg_scale", 1.0),
                    sub, text_tokenizer)
            else:
                raise ValueError(f"invalid schedule target {target_mod}")
        sync_to_host()
        return mod_dict

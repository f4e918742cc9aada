"""Chunked vocab-head sampling must match the unchunked formulation.

The sampler applies the 64k-vocab logits head + CFG mix + top-K reduction in
position chunks (so the full (G*B, k, V) fp32 logits tensor never exists on
device; see generate/sampler.py:chunked_head_sample).  Chunking is over
POSITIONS, so per-position results must be bit-identical to computing the
full logits and calling sample_tokens (reference semantics:
egom2p/models/generate.py:332-382, :805).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egom2p_tpu.generate.sampler import chunked_head_sample, sample_tokens
from egom2p_tpu.models.egom2p import EgoM2P, create_model


@pytest.fixture(scope="module")
def tiny():
    from egom2p_tpu.data.modality_info import MODALITY_INFO

    mods = ("tok_cam", "tok_gaze")
    info = {m: dict(MODALITY_INFO[m]) for m in mods}
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias", mods, mods,
                         modality_info=info, dim=64, encoder_depth=2,
                         decoder_depth=2, num_heads=4)
    B, L = 2, 30
    rng = np.random.default_rng(0)
    md = {}
    for m in mods:
        md[m] = {"tensor": rng.integers(0, 256, (B, L)).astype(np.int32),
                 "input_mask": np.zeros((B, L), bool),
                 "target_mask": np.ones((B, L), bool),
                 "decoder_attention_mask": np.zeros((B, L), np.int32)}
    md["tok_gaze"]["input_mask"][:] = True
    md["tok_gaze"]["target_mask"][:] = False
    dev = {m: {k: jnp.asarray(v) for k, v in d.items()}
           for m, d in md.items()}
    params = model.init(jax.random.PRNGKey(0), dev, 16, 16)
    # decoder hidden states for a k-position subset, stacked cond+uncond
    k = 13  # deliberately not a multiple of the chunk size
    ids_keep = jnp.asarray(
        np.stack([rng.permutation(L)[:k] for _ in range(B)]).astype(np.int32))
    ctx, enc_mask = model.apply(params, dev, 16,
                                method=EgoM2P.forward_enc_context)
    y = model.apply(params, dev, "tok_gaze", ctx, enc_mask, ids_keep,
                    method=EgoM2P.forward_dec_subset_hidden)
    vocab = info["tok_gaze"]["vocab_size"]
    return model, params, y, vocab


def _full_logits(model, params, y):
    return model.apply(params, "tok_gaze", y,
                       method=EgoM2P.forward_mod_logits)


@pytest.mark.parametrize("temperature,top_k,top_p", [
    (1.0, 0.0, 0.8),     # nucleus
    (0.7, 8, 0.0),       # user top-k
    (0.0, 0.0, 0.8),     # greedy
])
def test_chunked_matches_unchunked_single_branch(tiny, temperature, top_k,
                                                 top_p):
    model, params, y, vocab = tiny
    key = jax.random.PRNGKey(3)
    s_ref, p_ref = sample_tokens(_full_logits(model, params, y), key,
                                 temperature, top_k, top_p)
    s_chk, p_chk = chunked_head_sample(model, params, "tok_gaze", y, None,
                                       key, temperature, top_k, top_p,
                                       vocab, chunk=5)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_chk))
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_chk),
                               atol=1e-6)


def test_chunked_matches_unchunked_cfg(tiny, monkeypatch):
    """With EGOM2P_CFG_MIX=logits, CFG cond weights (s,) must reproduce
    lu + s*(lc - lu) bit-exactly (same fp32 expression form as the
    reference, generate.py:805)."""
    monkeypatch.setenv("EGOM2P_CFG_MIX", "logits")
    model, params, y, vocab = tiny
    scale = 2.0
    key = jax.random.PRNGKey(11)
    B = y.shape[0] // 2
    logits = _full_logits(model, params, y)
    lc, lu = logits[:B], logits[B:]
    mixed = lu + scale * (lc - lu)
    s_ref, p_ref = sample_tokens(mixed, key, 0.7, 0.0, 0.8)
    s_chk, p_chk = chunked_head_sample(model, params, "tok_gaze", y,
                                       (scale,), key, 0.7, 0.0,
                                       0.8, vocab, chunk=4)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_chk))
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_chk),
                               atol=1e-6)


def test_hidden_mix_equals_logit_mix(tiny):
    """The round-5 default mixes guidance in HIDDEN space before the vocab
    head; logits are linear in y, so the mixed logits must equal the
    reference's post-head mix to fp32 rounding, and the sampled
    distribution must match wherever the decision isn't inside the
    rounding band."""
    model, params, y, vocab = tiny
    scale = 2.0
    B = y.shape[0] // 2
    logits = _full_logits(model, params, y)
    lc, lu = logits[:B], logits[B:]
    mixed_ref = np.asarray(lu + scale * (lc - lu))
    y = np.asarray(y)
    y_mixed = y[B:] + scale * (y[:B] - y[B:])
    mixed_hidden = np.asarray(_full_logits(model, params,
                                           jnp.asarray(y_mixed)))
    # equality is at bf16-matmul precision, not fp32: the head computes in
    # the model's bf16 compute dtype, and bf16(y_mixed) @ W rounds
    # differently than mixing bf16-rounded logits (amplified ~|w|x by the
    # guidance scale) — the same precision class as every other matmul in
    # the network
    band = 0.02 * np.abs(mixed_ref).max()
    np.testing.assert_allclose(mixed_hidden, mixed_ref, atol=band)
    # greedy samples agree everywhere the top-2 margin exceeds the band
    margin = np.sort(mixed_ref, axis=-1)
    decisive = (margin[..., -1] - margin[..., -2]) > 2 * band
    s_hidden, _ = chunked_head_sample(model, params, "tok_gaze",
                                      jnp.asarray(y), (scale,),
                                      jax.random.PRNGKey(0), 0.0, 0.0, 0.0,
                                      vocab, chunk=4)
    s_ref = mixed_ref.argmax(axis=-1)
    match = (np.asarray(s_hidden) == s_ref)[decisive]
    assert match.all(), f"{(~match).sum()} decisive rows diverged"


def test_chunked_untruncated_full_vocab(tiny):
    """top_k=0, top_p=0: sampling the full vocab, still chunk-invariant."""
    model, params, y, vocab = tiny
    key = jax.random.PRNGKey(5)
    s_ref, p_ref = sample_tokens(_full_logits(model, params, y), key,
                                 1.3, 0.0, 0.0)
    s_chk, p_chk = chunked_head_sample(model, params, "tok_gaze", y, None,
                                       key, 1.3, 0.0, 0.0, vocab, chunk=6)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_chk))
    np.testing.assert_allclose(np.asarray(p_ref), np.asarray(p_chk),
                               atol=1e-6)

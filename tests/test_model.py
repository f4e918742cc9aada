"""Shape and semantics tests for the EgoM2P core model.

Uses a scaled-down modality registry (tiny vocabs / grids) so CPU tests are
fast; the real-size path is exercised by bench.py and __graft_entry__.py.
"""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egom2p_tpu.models.egom2p import EgoM2PConfig, EgoM2P, create_model
from egom2p_tpu.data.modality_info import MODALITY_INFO as _FULL_INFO
from egom2p_tpu.data.modality_info import generate_uint15_hash

MODS4 = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")

# Tiny registry: same structure, small vocabs/grids.
MODALITY_INFO = copy.deepcopy({m: _FULL_INFO[m] for m in MODS4})
for _m in ("tok_rgb", "tok_depth"):
    MODALITY_INFO[_m].update(vocab_size=96, max_tokens=2 * 4 * 4)
    MODALITY_INFO[_m]["embed_spec"] = {
        "kind": "video_token", "vocab_size": 96, "grid": (2, 4, 4)}
for _m in ("tok_cam", "tok_gaze"):
    MODALITY_INFO[_m].update(vocab_size=32, max_tokens=8)
    MODALITY_INFO[_m]["embed_spec"] = {
        "kind": "gazecam_token", "vocab_size": 32, "length": 8}


def make_mod_dict(rng: np.random.Generator, batch=2, mods=MODS4,
                  n_in=64, n_tgt=64, info=None):
    """Synthetic masked mod dict with the UnifiedMasking output format."""
    info = info or MODALITY_INFO
    out = {}
    budgets_in = {m: 0 for m in mods}
    budgets_tgt = {m: 0 for m in mods}
    # simple even split
    for m in mods:
        budgets_in[m] = n_in // len(mods)
        budgets_tgt[m] = n_tgt // len(mods)
    for m in mods:
        L = info[m]["max_tokens"]
        V = info[m]["vocab_size"]
        tensor = rng.integers(0, V, size=(batch, L))
        input_mask = np.ones((batch, L), dtype=bool)
        target_mask = np.ones((batch, L), dtype=bool)
        attn = np.zeros((batch, L), dtype=np.int32)
        for b in range(batch):
            perm = rng.permutation(L)
            bi = min(budgets_in[m], L)
            bt = min(budgets_tgt[m], L - bi)
            input_mask[b, perm[:bi]] = False
            target_mask[b, perm[bi:bi + bt]] = False
            # cumsum-encoding: first unmasked target position carries budget
            unmasked = np.where(~target_mask[b])[0]
            if len(unmasked):
                attn[b, unmasked[0]] = len(unmasked)
        out[m] = {
            "tensor": jnp.asarray(tensor, dtype=jnp.int32),
            "input_mask": jnp.asarray(input_mask),
            "target_mask": jnp.asarray(target_mask),
            "decoder_attention_mask": jnp.asarray(attn),
        }
    return out


@pytest.fixture(scope="module")
def tiny_model_and_params():
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                         in_domains=MODS4, out_domains=MODS4,
                         modality_info=MODALITY_INFO)
    rng = np.random.default_rng(0)
    mod_dict = make_mod_dict(rng, n_in=24, n_tgt=24)
    params = model.init(jax.random.PRNGKey(0), mod_dict, 24, 24)
    return model, params, mod_dict


def test_forward_loss_finite(tiny_model_and_params):
    model, params, mod_dict = tiny_model_and_params
    f = jax.jit(lambda p, md: model.apply(p, md, 24, 24, "mod"))
    loss, mod_loss = f(params, mod_dict)
    assert np.isfinite(float(loss))
    assert set(mod_loss) == set(MODS4)
    for m, v in mod_loss.items():
        assert np.isfinite(float(v))
        # untrained CE should be close to ln(vocab)
        assert abs(float(v) - np.log(MODALITY_INFO[m]["vocab_size"])) < 1.0
    # repeat call deterministic
    loss2, _ = f(params, mod_dict)
    assert np.allclose(float(loss), float(loss2))


def test_loss_types(tiny_model_and_params):
    model, params, mod_dict = tiny_model_and_params
    for lt in ("weighted_mod", "token"):
        loss, _ = jax.jit(lambda p, md, lt=lt: model.apply(p, md, 24, 24, lt))(
            params, mod_dict)
        assert np.isfinite(float(loss)), lt


def test_return_logits_shapes(tiny_model_and_params):
    model, params, mod_dict = tiny_model_and_params
    logits = jax.jit(
        lambda p, md: model.apply(p, md, 24, 24, return_logits=True)
    )(params, mod_dict)
    for m in MODS4:
        assert logits[m].shape == (2, 24, MODALITY_INFO[m]["vocab_size"])


@pytest.mark.slow
def test_grad_flows(tiny_model_and_params):
    model, params, mod_dict = tiny_model_and_params

    @jax.jit
    def grad_fn(p):
        return jax.grad(lambda q: model.apply(q, mod_dict, 24, 24, "mod")[0])(p)

    g = grad_fn(params)
    leaves = jax.tree_util.tree_leaves(g)
    norms = [float(jnp.abs(l).max()) for l in leaves]
    assert all(np.isfinite(n) for n in norms)
    assert any(n > 0 for n in norms)


def test_mask_gather_keeps_unmasked_first():
    """Deterministic argsort must keep unmasked tokens (in concat order)."""
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                         in_domains=("tok_cam", "tok_gaze"),
                         out_domains=("tok_cam", "tok_gaze"),
                         modality_info=MODALITY_INFO)
    rng = np.random.default_rng(1)
    mod_dict = make_mod_dict(rng, batch=1, mods=("tok_cam", "tok_gaze"),
                             n_in=8, n_tgt=8)
    params = model.init(jax.random.PRNGKey(0), mod_dict, 8, 8)

    def probe(p, md):
        enc = model.bind(p).embed_encoder(md)
        tokens, emb, mask, mod_ids = model.bind(p).forward_mask_encoder(enc, 8)
        return mask, mod_ids

    mask, mod_ids = probe(params, mod_dict)
    n_unmasked_src = int((~mod_dict["tok_cam"]["input_mask"]).sum()
                         + (~mod_dict["tok_gaze"]["input_mask"]).sum())
    kept_valid = int((~mask[0, 0]).sum())
    assert kept_valid == min(8, n_unmasked_src)
    # padded slots marked -1
    assert bool((np.asarray(mod_ids)[0][np.asarray(mask)[0, 0]] == -1).all())


@pytest.mark.slow
def test_chunked_ce_chunk_size_invariant(monkeypatch):
    """The lax.cond chunk-skip in _chunked_masked_ce must leave loss AND
    parameter gradients invariant to the tile size up to fp reassociation
    (skipped all-zero-weight chunks contribute exactly zero either way;
    different tile sizes reassociate the scan/logsumexp accumulations)."""
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                         in_domains=MODS4, out_domains=MODS4,
                         modality_info=MODALITY_INFO,
                         compute_dtype="float32")  # exact-math identity test
    rng = np.random.default_rng(3)
    md = make_mod_dict(rng, batch=2, mods=MODS4, n_in=24, n_tgt=24)
    params = model.init(jax.random.PRNGKey(0), md, 24, 24)

    def loss_fn(p):
        loss, _ = model.apply(p, md, 24, 24, "mod")
        return loss

    results = {}
    # (chunk, skip): default no-skip vs cond-skip at two tile sizes
    # (48 decoder rows -> padding, fully-skipped and partial chunks)
    for chunk, sk in (("0", "0"), ("8", "1"), ("64", "1")):
        monkeypatch.setenv("EGOM2P_CE_CHUNK", chunk)
        monkeypatch.setenv("EGOM2P_CE_SKIP", sk)
        results[(chunk, sk)] = jax.jit(jax.value_and_grad(loss_fn))(params)
    monkeypatch.delenv("EGOM2P_CE_CHUNK")
    monkeypatch.delenv("EGOM2P_CE_SKIP")
    (l_ref, g_ref) = results[("0", "0")]
    for key in (("8", "1"), ("64", "1")):
        l_k, g_k = results[key]
        np.testing.assert_allclose(float(l_k), float(l_ref), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g_k),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32), atol=1e-4)


@pytest.mark.slow
def test_remat_policies_preserve_loss_and_grads():
    """Activation checkpointing is a memory/speed knob only: loss and
    gradients must be identical (fp32 exact math) across no-remat, full
    per-block remat, and the selective dots-saveable policy."""
    rng = np.random.default_rng(5)
    md = make_mod_dict(rng, batch=2, mods=MODS4, n_in=24, n_tgt=24)

    results = {}
    for name, kw in (("none", dict(use_act_checkpoint=False)),
                     ("full", dict(use_act_checkpoint=True,
                                   remat_policy="full")),
                     ("dots", dict(use_act_checkpoint=True,
                                   remat_policy="dots"))):
        model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                             in_domains=MODS4, out_domains=MODS4,
                             modality_info=MODALITY_INFO,
                             compute_dtype="float32", **kw)
        params = model.init(jax.random.PRNGKey(0), md, 24, 24)

        def loss_fn(p):
            loss, _ = model.apply(p, md, 24, 24, "mod")
            return loss

        results[name] = jax.jit(jax.value_and_grad(loss_fn))(params)

    l_ref, g_ref = results["none"]
    for name in ("full", "dots"):
        l_k, g_k = results[name]
        np.testing.assert_allclose(float(l_k), float(l_ref), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g_k),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a, np.float32),
                                       np.asarray(b, np.float32), atol=1e-5)

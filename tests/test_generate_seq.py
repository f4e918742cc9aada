"""Autoregressive sequence generation + LoRA tests."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egom2p_tpu.data.modality_info import generate_uint15_hash
from egom2p_tpu.generate import (GenerationSampler,
                                 build_chained_generation_schedules,
                                 init_empty_target_modality,
                                 init_full_input_modality)
from egom2p_tpu.models.egom2p import create_model
from tests.test_model import MODALITY_INFO as TINY_INFO


@pytest.fixture(scope="module")
def seq_setup():
    info = copy.deepcopy({m: TINY_INFO[m] for m in ("tok_rgb",)})
    info["caption"] = {
        "vocab_size": 64, "min_tokens": 0, "max_tokens": 12, "type": "seq",
        "id": generate_uint15_hash("caption"),
        "embed_spec": {"kind": "sequence", "vocab_size": 64, "max_length": 12,
                       "padding_idx": 0},
    }
    mods = ("tok_rgb", "caption")
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias", mods, mods,
                         modality_info=info)
    L = info["tok_rgb"]["max_tokens"]
    mod_dict = {"tok_rgb": {
        "tensor": np.random.default_rng(0).integers(0, 96, size=(1, L)).astype(np.int32)}}
    init_full_input_modality(mod_dict, info, "tok_rgb")
    init_empty_target_modality(mod_dict, info, "caption", 1, 12)
    md_init = {m: {k: jnp.asarray(v) for k, v in d.items()}
               for m, d in mod_dict.items()}
    params = model.init(jax.random.PRNGKey(0), md_init, 16, 16)
    return model, params, mod_dict, info


@pytest.mark.parametrize("cfg", [1.0, 2.0])
def test_autoregressive_seq_generation(seq_setup, cfg):
    model, params, mod_dict, info = seq_setup
    sampler = GenerationSampler(model, params, info)
    schedule = build_chained_generation_schedules(
        ["tok_rgb"], ["caption"], [12], ["autoregressive"], [0], ["linear"],
        [0.7], ["constant"], [cfg], ["constant"])
    out = sampler.generate(mod_dict, schedule, top_p=0.9, seed=3)
    d = out["caption"]
    filled = ~d["input_mask"]
    # the AR loop must actually iterate: with random weights an EOS id is a
    # ~1/64 draw per step, so requiring several filled positions catches a
    # schedule that aborts after the first step (early natural EOS could in
    # principle stop sooner, but not at this seed)
    assert int(filled.sum()) >= 3, int(filled.sum())
    assert (d["tensor"][filled] < 64).all()
    # filled positions form a contiguous prefix (AR reveals left-to-right)
    idx = np.where(np.asarray(filled[0]))[0]
    assert np.array_equal(idx, np.arange(len(idx))), idx


def test_seq_generation_with_device_resident_conditioning(seq_setup):
    """Caller-provided device (jax.Array) conditioning tensors must work on
    the host-resident seq path: the sampler materializes them to numpy before
    any in-place mutation (regression: the dirty-only final sync must not
    drop that materialization)."""
    import jax.numpy as jnp

    model, params, mod_dict, info = seq_setup
    sampler = GenerationSampler(model, params, info)
    md = {m: {k: np.array(v) for k, v in d.items()}
          for m, d in mod_dict.items()}
    md["tok_rgb"]["tensor"] = jnp.asarray(md["tok_rgb"]["tensor"])
    schedule = build_chained_generation_schedules(
        ["tok_rgb"], ["caption"], [12], ["autoregressive"], [0], ["linear"],
        [0.7], ["constant"], [2.0], ["constant"])
    out = sampler.generate(md, schedule, top_p=0.9, seed=3)
    assert (~out["caption"]["input_mask"]).sum() >= 1


@pytest.mark.slow
def test_lora_roundtrip():
    from egom2p_tpu.models.lora import (init_lora_params, lora_train_step_fn,
                                        merge_lora)
    mods = ("tok_cam", "tok_gaze")
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias", mods, mods,
                         modality_info=TINY_INFO)
    from tests.test_model import make_mod_dict
    md = make_mod_dict(np.random.default_rng(0), batch=1, mods=mods,
                       n_in=8, n_tgt=8)
    params = model.init(jax.random.PRNGKey(0), md, 8, 8)
    lora = init_lora_params(params, jax.random.PRNGKey(1), rank=2)
    assert len(lora) > 0

    # b == 0 at init -> merged params identical, losses identical
    merged = merge_lora(params, lora)
    l0, _ = jax.jit(lambda p: model.apply(p, md, 8, 8, "mod"))(params)
    l1, _ = jax.jit(lambda p: model.apply(p, md, 8, 8, "mod"))(merged)
    assert np.allclose(float(l0), float(l1), rtol=1e-6)

    # grads flow only through lora params
    apply_lora = lora_train_step_fn(
        lambda p, md: model.apply(p, md, 8, 8, "mod")[0], params)
    g = jax.jit(jax.grad(apply_lora))(lora, md)
    norms = [float(jnp.abs(x).max()) for x in jax.tree_util.tree_leaves(g)]
    assert any(n > 0 for n in norms)
    assert all(np.isfinite(n) for n in norms)


class _FakeTok:
    """Minimal sentinel vocab for span merging."""

    def token_to_id(self, t):
        return {"[PAD]": 0, "[EOS]": 3}.get(t, 100 + int(t[3:-1])
                                            if t.startswith("[S_") else None)

    def get_vocab(self):
        return {f"[S_{i}]": 40 + i for i in range(8)}


def test_generate_sam_dense(seq_setup):
    """Dense-instance generation: batched seq sampling merged into one long
    sequence (reference: generate.py:1231-1274)."""
    model, params, mod_dict, info = seq_setup
    sampler = GenerationSampler(model, params, info)
    schedule = build_chained_generation_schedules(
        cond_domains=["tok_rgb"], target_domains=["caption"],
        tokens_per_target=[12], autoregression_schemes=["autoregressive"],
        decoding_steps=[1], token_decoding_schedules=["linear"],
        temps=[1.0], temp_schedules=["constant"], cfg_scales=[1.0],
        cfg_schedules=["constant"])
    out = sampler.generate_sam_dense(mod_dict, schedule, _FakeTok(),
                                     batch_size=3, key="caption",
                                     top_p=0.8, seed=0)
    d = out["caption"]
    assert d["tensor"].ndim == 2 and d["tensor"].shape[0] == 1
    assert d["tensor"].shape[1] >= 1
    assert not d["input_mask"].any()
    assert d["target_mask"].all()


# ------------------------------------------------------------- seq_emb CFG
@pytest.fixture(scope="module")
def seq_emb_setup():
    """Tiny model with a precomputed-text-embedding (seq_emb) conditioning
    modality and a video-token target (reference: T5 captions conditioning,
    generate.py:146-151, 678-679)."""
    info = copy.deepcopy({m: TINY_INFO[m] for m in ("tok_rgb", "tok_depth")})
    info["cap_emb"] = {
        "min_tokens": 0, "max_tokens": 8, "type": "seq_emb",
        "id": generate_uint15_hash("cap_emb"),
        "embed_spec": {"kind": "sequence_emb", "max_length": 8,
                       "orig_emb_dim": 16},
    }
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                         in_domains=("tok_rgb", "tok_depth", "cap_emb"),
                         out_domains=("tok_rgb", "tok_depth"),
                         modality_info=info)
    rng = np.random.default_rng(0)
    L = info["tok_rgb"]["max_tokens"]
    mod_dict = {
        "tok_rgb": {"tensor": rng.integers(0, 96, (1, L)).astype(np.int32)},
        "cap_emb": {
            "tensor": rng.normal(0, 1, (1, 8, 16)).astype(np.float32),
            "mask_valid": np.array([[1, 1, 1, 1, 1, 0, 0, 0]], dtype=bool),
        },
    }
    init_full_input_modality(mod_dict, info, "tok_rgb")
    init_full_input_modality(mod_dict, info, "cap_emb")
    init_empty_target_modality(mod_dict, info, "tok_depth", 1, L)
    md_init = {m: {k: jnp.asarray(v) for k, v in d.items()}
               for m, d in mod_dict.items()}
    params = model.init(jax.random.PRNGKey(0), md_init, 16, 16)
    return model, params, mod_dict, info


def test_seq_emb_init_full_input_uses_mask_valid(seq_emb_setup):
    _, _, mod_dict, _ = seq_emb_setup
    d = mod_dict["cap_emb"]
    np.testing.assert_array_equal(d["input_mask"], ~d["mask_valid"])
    assert d["target_mask"].all()
    assert not d["decoder_attention_mask"].any()


def test_empty_seq_emb_matches_reference_semantics():
    """Mechanism parity with the reference's empty_seq_emb_modality
    (reference: generate.py:65-80)."""
    from egom2p_tpu.generate.sampler import empty_seq_emb_modality

    rng = np.random.default_rng(1)
    d = {
        "tensor": rng.normal(0, 1, (2, 8, 16)).astype(np.float32),
        "input_mask": rng.uniform(size=(2, 8)) > 0.5,
        "target_mask": np.zeros((2, 8), dtype=bool),
        "decoder_attention_mask": np.ones((2, 8), dtype=np.int32),
    }
    empty_seq_emb_modality(d)
    assert (d["tensor"] == 0).all()
    expected_im = np.ones((2, 8), dtype=bool)
    expected_im[:, 0] = False  # one live zero-embedding slot survives
    np.testing.assert_array_equal(d["input_mask"], expected_im)
    assert d["target_mask"].all()
    assert not d["decoder_attention_mask"].any()

    # direct comparison against the reference implementation on torch tensors
    import sys as _sys
    _sys.path.append("/root/reference")
    try:
        import torch
        from egom2p.models.generate import \
            empty_seq_emb_modality as ref_empty
    except Exception:
        pytest.skip("reference torch import unavailable")
    ref = {"k": {
        "tensor": torch.randn(2, 8, 16),
        "input_mask": torch.rand(2, 8) > 0.5,
        "target_mask": torch.zeros(2, 8, dtype=torch.bool),
        "decoder_attention_mask": torch.ones(2, 8, dtype=torch.bool),
    }}
    ref = ref_empty(ref, "k")["k"]
    np.testing.assert_array_equal(d["tensor"] != 0,
                                  ref["tensor"].numpy() != 0)
    np.testing.assert_array_equal(d["input_mask"], ref["input_mask"].numpy())
    np.testing.assert_array_equal(d["target_mask"],
                                  ref["target_mask"].numpy())
    np.testing.assert_array_equal(d["decoder_attention_mask"].astype(bool),
                                  ref["decoder_attention_mask"].numpy())


@pytest.mark.slow
@pytest.mark.parametrize("scheme", ["roar", "maskgit"])
def test_seq_emb_cfg_generation(seq_emb_setup, scheme):
    """Guided generation with seq_emb conditioning runs the stacked
    cond/uncond path end-to-end (the round-2 NotImplementedError hole)."""
    model, params, mod_dict, info = seq_emb_setup
    L = info["tok_depth"]["max_tokens"]
    sampler = GenerationSampler(model, params, info)
    schedule = build_chained_generation_schedules(
        cond_domains=["tok_rgb", "cap_emb"], target_domains=["tok_depth"],
        tokens_per_target=[L], autoregression_schemes=[scheme],
        decoding_steps=[2], token_decoding_schedules=["linear"],
        temps=[0.01], temp_schedules=["constant"],
        cfg_scales=[2.0], cfg_schedules=["constant"])
    out = sampler.generate(mod_dict, schedule, top_p=0.8, seed=0)
    d = out["tok_depth"]
    assert not d["input_mask"].any()
    assert (np.asarray(d["tensor"]) < 96).all()

    # guidance must actually change the outcome vs unguided sampling
    schedule_ng = build_chained_generation_schedules(
        cond_domains=["tok_rgb", "cap_emb"], target_domains=["tok_depth"],
        tokens_per_target=[L], autoregression_schemes=[scheme],
        decoding_steps=[2], token_decoding_schedules=["linear"],
        temps=[0.01], temp_schedules=["constant"],
        cfg_scales=[1.0], cfg_schedules=["constant"])
    out_ng = sampler.generate(mod_dict, schedule_ng, top_p=0.8, seed=0)
    assert not np.array_equal(np.asarray(d["tensor"]),
                              np.asarray(out_ng["tok_depth"]["tensor"]))


def test_init_empty_target_seq_emb_routes_to_emb_helper():
    """seq_emb domains get a zeroed float (B, N, E) embedding tensor with
    empty_seq_emb_modality's mask semantics (reference: generate.py:108-111
    routes seq_emb to empty_seq_emb_modality, not empty_seq_modality)."""
    from egom2p_tpu.data.modality_info import MODALITY_INFO

    mod_dict = {}
    init_empty_target_modality(mod_dict, MODALITY_INFO, "t5_caption", 2, 8)
    d = mod_dict["t5_caption"]
    assert d["tensor"].shape == (2, 8, 4096)
    assert d["tensor"].dtype == np.float32
    assert (d["tensor"] == 0).all()
    # CFG-critical mask layout: one live slot, everything else masked
    assert not d["input_mask"][:, 0].any()
    assert d["input_mask"][:, 1:].all()
    assert d["target_mask"].all()
    assert (d["decoder_attention_mask"] == 0).all()

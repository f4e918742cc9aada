"""Generation sampler tests: schedules + ROAR/MaskGIT with and without CFG."""
import jax
import numpy as np
import pytest

from egom2p_tpu.generate import (GenerationSampler,
                                 build_chained_generation_schedules,
                                 init_empty_target_modality,
                                 init_full_input_modality)
from egom2p_tpu.generate.schedules import cosine_schedule, linear_schedule
from egom2p_tpu.models.egom2p import create_model

from tests.test_model import MODALITY_INFO  # tiny registry

MODS = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")


def test_linear_schedule_matches_reference_semantics():
    s = linear_schedule(3, 5120)
    assert s.sum() == 5120
    assert list(s) == [1707, 1707, 1706]
    s = linear_schedule(10, 5)  # more steps than tokens: trailing zeros trimmed
    assert s.sum() == 5 and (s > 0).all()


def test_cosine_schedule_sums():
    s = cosine_schedule(8, 100)
    assert s.sum() == 100


def test_chained_schedule_build():
    sched = build_chained_generation_schedules(
        cond_domains=["tok_rgb"], target_domains=["tok_depth"],
        tokens_per_target=[5120], autoregression_schemes=["roar"],
        decoding_steps=[3], token_decoding_schedules=["linear"],
        temps=[0.01], temp_schedules=["constant"],
        cfg_scales=[2.0], cfg_schedules=["constant"],
        cfg_grow_conditioning=True)
    assert len(sched) == 3
    assert sched[0]["num_tokens"] == 1707
    assert sched[0]["cfg_cond_domains"] == ["tok_rgb"]
    assert sched[0]["cfg_scale"] == 2.0


@pytest.fixture(scope="module")
def sampler_setup():
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                         in_domains=MODS, out_domains=MODS,
                         modality_info=MODALITY_INFO)
    L = MODALITY_INFO["tok_rgb"]["max_tokens"]  # 32 in the tiny registry
    mod_dict = {
        "tok_rgb": {
            "tensor": np.random.default_rng(0).integers(
                0, 96, size=(1, L)).astype(np.int32),
        }
    }
    init_full_input_modality(mod_dict, MODALITY_INFO, "tok_rgb")
    init_empty_target_modality(mod_dict, MODALITY_INFO, "tok_depth", 1, L)
    # init params through the standard forward
    import jax.numpy as jnp
    md_init = {m: {k: jnp.asarray(v) for k, v in d.items()}
               for m, d in mod_dict.items()}
    params = model.init(jax.random.PRNGKey(0), md_init, 16, 16)
    return model, params, mod_dict


@pytest.mark.parametrize("scheme,cfg", [("roar", 1.0), ("roar", 2.0),
                                        ("maskgit", 1.0), ("maskgit", 2.0)])
@pytest.mark.slow
def test_generate_fills_target(sampler_setup, scheme, cfg):
    model, params, mod_dict = sampler_setup
    L = MODALITY_INFO["tok_depth"]["max_tokens"]
    sampler = GenerationSampler(model, params, MODALITY_INFO)
    schedule = build_chained_generation_schedules(
        cond_domains=["tok_rgb"], target_domains=["tok_depth"],
        tokens_per_target=[L], autoregression_schemes=[scheme],
        decoding_steps=[3], token_decoding_schedules=["linear"],
        temps=[0.01], temp_schedules=["constant"],
        cfg_scales=[cfg], cfg_schedules=["constant"])
    out = sampler.generate(mod_dict, schedule, top_p=0.8, seed=0)
    d = out["tok_depth"]
    assert d["target_mask"].all(), "all target positions must be filled"
    assert (~d["input_mask"]).all()
    assert (d["tensor"] >= 0).all() and (d["tensor"] < 96).all()
    # conditioning untouched
    assert np.array_equal(out["tok_rgb"]["tensor"], mod_dict["tok_rgb"]["tensor"])


def test_generate_deterministic_with_seed(sampler_setup):
    # NOTE: temp is near-argmax (0.01), not 1.0 — XLA:CPU matmuls are not
    # bitwise run-to-run deterministic (threaded oneDNN reductions), and at
    # temp 1.0 the random-weight logits are near-uniform, so ~1e-7 jitter
    # flips the inverse-CDF sample at many positions.  At 0.01 sampling is
    # effectively argmax and the same seed must reproduce exactly.
    model, params, mod_dict = sampler_setup
    L = MODALITY_INFO["tok_depth"]["max_tokens"]
    sampler = GenerationSampler(model, params, MODALITY_INFO)
    # ONE decoding step: with 2+ steps, a single tie-flip in step 1 grows
    # the step-2 conditioning differently and avalanches through every
    # later logit, so the match rate under load is unbounded below (seen
    # <0.99 in a full-suite run on a busy host).  One step has no cascade:
    # flips can only come from genuine per-position ties.
    schedule = build_chained_generation_schedules(
        ["tok_rgb"], ["tok_depth"], [L], ["roar"], [1], ["linear"],
        [0.01], ["constant"], [2.0], ["constant"])
    out1 = sampler.generate(mod_dict, schedule, top_p=0.8, seed=7)
    out2 = sampler.generate(mod_dict, schedule, top_p=0.8, seed=7)
    # Exact on TPU; on XLA:CPU the threaded oneDNN reductions can still flip
    # an occasional argmax near-tie under load, so allow sub-percent jitter.
    t1, t2 = out1["tok_depth"]["tensor"], out2["tok_depth"]["tensor"]
    assert (t1 == t2).mean() > 0.99, f"match rate {(t1 == t2).mean():.4f}"
    # seed sensitivity needs real sampling entropy (at 0.01 the untrained
    # model collapses to a single argmax token for every seed)
    hot = build_chained_generation_schedules(
        ["tok_rgb"], ["tok_depth"], [L], ["roar"], [2], ["linear"],
        [1.0], ["constant"], [2.0], ["constant"])
    out3 = sampler.generate(mod_dict, hot, top_p=0.8, seed=7)
    out4 = sampler.generate(mod_dict, hot, top_p=0.8, seed=8)
    assert not np.array_equal(out3["tok_depth"]["tensor"], out4["tok_depth"]["tensor"])

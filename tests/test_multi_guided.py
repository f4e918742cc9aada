"""Multi-condition weighted guidance + generate_iter tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egom2p_tpu.generate import (GenerationSampler,
                                 build_chained_generation_schedules,
                                 init_empty_target_modality,
                                 init_full_input_modality)
from egom2p_tpu.models.egom2p import create_model
from tests.test_model import MODALITY_INFO

MODS = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")


@pytest.fixture(scope="module")
def setup():
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias", MODS, MODS,
                         modality_info=MODALITY_INFO)
    rng = np.random.default_rng(0)
    L = MODALITY_INFO["tok_rgb"]["max_tokens"]
    Lc = MODALITY_INFO["tok_cam"]["max_tokens"]

    def img_cond(mod, L):
        return {"tensor": rng.integers(
            0, MODALITY_INFO[mod]["vocab_size"], size=(1, L)).astype(np.int32)}

    uncond = {"tok_rgb": img_cond("tok_rgb", L),
              "tok_cam": img_cond("tok_cam", Lc)}
    init_full_input_modality(uncond, MODALITY_INFO, "tok_rgb")
    init_full_input_modality(uncond, MODALITY_INFO, "tok_cam")
    init_empty_target_modality(uncond, MODALITY_INFO, "tok_depth", 1, L)

    # two single-modality conditions (reference: generate_multi_guided usage)
    cond1 = {"tok_rgb": {k: np.array(v) for k, v in uncond["tok_rgb"].items()}}
    cond2 = {"tok_cam": {k: np.array(v) for k, v in uncond["tok_cam"].items()}}

    md_init = {m: {k: jnp.asarray(v) for k, v in d.items()}
               for m, d in uncond.items()}
    params = model.init(jax.random.PRNGKey(0), md_init, 24, 24)
    return model, params, uncond, [cond1, cond2]


def test_generate_multi_guided_fills_target(setup):
    model, params, uncond, conds = setup
    L = MODALITY_INFO["tok_depth"]["max_tokens"]
    sampler = GenerationSampler(model, params, MODALITY_INFO)
    schedule = build_chained_generation_schedules(
        ["tok_rgb", "tok_cam"], ["tok_depth"], [L], ["roar"], [2], ["linear"],
        [0.5], ["constant"], [[1.5, 0.8]], ["constant"])
    out = sampler.generate_multi_guided(uncond, conds, schedule, top_p=0.8,
                                        seed=0)
    assert out["tok_depth"]["target_mask"].all()
    assert (out["tok_depth"]["tensor"]
            < MODALITY_INFO["tok_depth"]["vocab_size"]).all()


def test_generate_iter_steps(setup):
    model, params, uncond, _ = setup
    L = MODALITY_INFO["tok_depth"]["max_tokens"]
    sampler = GenerationSampler(model, params, MODALITY_INFO)
    schedule = build_chained_generation_schedules(
        ["tok_rgb"], ["tok_depth"], [L], ["roar"], [3], ["linear"],
        [0.5], ["constant"], [1.0], ["constant"])
    seen = 0
    for md in sampler.generate_iter(uncond, schedule, top_p=0.8, seed=0):
        seen += 1
        filled = md["tok_depth"]["target_mask"].sum()
        assert filled > 0
    assert seen == 3


@pytest.mark.slow
def test_vqvae_ema():
    import optax
    from egom2p_tpu.tokenizers.seq_vqvae import seq_vqvae_from_config
    from egom2p_tpu.train.vqvae_train import (init_train_state,
                                              make_vqvae_train_step)
    tok = seq_vqvae_from_config("cam", jax.random.PRNGKey(0),
                                dim=64, depth=1, num_heads=4)
    opt = optax.adamw(1e-3)
    step = jax.jit(make_vqvae_train_step(tok.module, tok.vq_cfg, opt,
                                         ema_decay=0.9))
    state = init_train_state(tok.params, opt, tok.vq_state, use_ema=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 60, 9)),
                    jnp.float32)
    s1, _ = step(state, x, jax.random.PRNGKey(1))
    # EMA moved toward new params but is not equal to them
    p = jax.tree_util.tree_leaves(s1.params)
    e = jax.tree_util.tree_leaves(s1.ema_params)
    p0 = jax.tree_util.tree_leaves(state.params)
    moved = sum(float(jnp.abs(a - b).sum()) for a, b in zip(e, p0))
    not_equal = sum(float(jnp.abs(a - b).sum()) for a, b in zip(e, p))
    assert moved > 0 and not_equal > 0

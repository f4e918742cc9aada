"""Data-parallel sharded generation on the 8-virtual-device CPU mesh.

Serving scale-out: the GenerationSampler's fused step functions carry no
device assumptions — sharding the batch dimension of the device-resident
mod-dict state over a mesh lets GSPMD partition every step, and results must
match the unsharded run exactly (the chain is deterministic given the seed;
reference determinism anchor: eval_model_rgb2depth.py seed=0).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow
from jax.sharding import NamedSharding, PartitionSpec as P

from egom2p_tpu.core.mesh import make_mesh
from egom2p_tpu.generate import (build_chained_generation_schedules,
                                 init_empty_target_modality,
                                 init_full_input_modality)
from egom2p_tpu.generate.sampler import GenerationSampler
from egom2p_tpu.models.egom2p import create_model
from tests.test_model import MODALITY_INFO


def _setup():
    mods = ("tok_cam", "tok_gaze")
    info = {m: dict(MODALITY_INFO[m]) for m in mods}
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias", mods, mods,
                         modality_info=info, dim=64, encoder_depth=2,
                         decoder_depth=2, num_heads=4)
    B, L = 8, info["tok_gaze"]["max_tokens"]
    rng = np.random.default_rng(0)
    sample = {"tok_cam": {
        "tensor": rng.integers(0, 256, (B, L)).astype(np.int32),
        "input_mask": np.zeros((B, L), bool),
        "target_mask": np.ones((B, L), bool)}}
    init_empty_target_modality(sample, info, "tok_gaze", B, L)
    init_full_input_modality(sample, info, "tok_cam")
    params = model.init(
        jax.random.PRNGKey(0),
        {m: {k: jnp.asarray(v) for k, v in d.items()}
         for m, d in sample.items()}, 16, 16)
    schedule = build_chained_generation_schedules(
        cond_domains=["tok_cam"], target_domains=["tok_gaze"],
        tokens_per_target=[L], autoregression_schemes=["roar"],
        decoding_steps=[2], token_decoding_schedules=["linear"],
        temps=[0.01], temp_schedules=["constant"], cfg_scales=[2.0],
        cfg_schedules=["constant"], cfg_grow_conditioning=True)
    return model, params, info, sample, schedule


def test_dp_sharded_generation_matches_single_device():
    model, params, info, sample, schedule = _setup()

    def run(shard: bool):
        sampler = GenerationSampler(model, params, info)
        md = {m: {k: np.array(v) for k, v in d.items()}
              for m, d in sample.items()}
        if shard:
            mesh = make_mesh()
            bsh = NamedSharding(mesh, P(("replica", "data")))
            for m in md:
                md[m]["tensor"] = jax.device_put(md[m]["tensor"], bsh)
        out = sampler.generate(md, schedule, top_p=0.8, top_k=0.0, seed=3)
        return np.asarray(out["tok_gaze"]["tensor"])

    single = run(shard=False)
    sharded = run(shard=True)
    np.testing.assert_array_equal(single, sharded)

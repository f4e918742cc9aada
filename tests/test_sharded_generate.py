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


def test_tp_sharded_generation_matches_single_device():
    """Tensor-parallel serving: params sharded over the model axis by
    tp_spec (Megatron column/row/vocab rules) with the batch replicated must
    reproduce the unsharded generation exactly — GSPMD inserts the
    collectives; on TPU the hd-64 attention additionally routes through the
    shard_map flash path (test_sharding.py covers its numerics)."""
    from egom2p_tpu.core.mesh import MeshConfig
    from egom2p_tpu.train.egom2p_train import tp_param_shardings

    model, params, info, sample, schedule = _setup()

    def run(tp: bool):
        p = params
        if tp:
            mesh = make_mesh(MeshConfig(replica=1, data=1, model=2),
                             devices=jax.devices()[:2])
            shardings = tp_param_shardings(mesh, params, 2)
            specs = [str(s.spec)
                     for s in jax.tree_util.tree_leaves(shardings)]
            assert any("model" in s for s in specs), specs[:5]
            p = jax.device_put(params, shardings)
        sampler = GenerationSampler(model, p, info)
        md = {m: {k: np.array(v) for k, v in d.items()}
              for m, d in sample.items()}
        out = sampler.generate(md, schedule, top_p=0.8, top_k=0.0, seed=3)
        return np.asarray(out["tok_gaze"]["tensor"])

    single = run(tp=False)
    tp = run(tp=True)
    # row-parallel matmuls psum partial products, reassociating the fp32
    # accumulation vs the unsharded dot — logits agree to ulps, so sampled
    # ids match except where two candidates are near-tied.  Require near-
    # total agreement instead of bitwise equality...
    mismatch = np.mean(single != tp)
    assert mismatch <= 0.02, f"TP generation diverged: {mismatch:.1%}"

    # ...and pin the numerics with a principled float-level check: the
    # encoder context under TP must match the unsharded forward to fp32
    # reassociation noise (a real sharding corruption is orders of
    # magnitude larger than reassociation ulps)
    from egom2p_tpu.models.egom2p import EgoM2P

    md_dev = {m: {k: jnp.asarray(v) for k, v in d.items()}
              for m, d in sample.items()}
    def ctx(p):
        c, _ = model.apply(p, md_dev, 16, method=EgoM2P.forward_enc_context)
        return c
    mesh = make_mesh(MeshConfig(replica=1, data=1, model=2),
                     devices=jax.devices()[:2])
    p_tp = jax.device_put(params, tp_param_shardings(mesh, params, 2))
    c_ref = np.asarray(jax.jit(ctx)(params), np.float32)
    c_tp = np.asarray(jax.jit(ctx)(p_tp), np.float32)
    np.testing.assert_allclose(c_tp, c_ref, atol=1e-4, rtol=1e-4)


def test_eval_cli_tensor_parallel_wiring():
    """eval_model_* --tensor_parallel N: flag parses, params get model-axis
    shardings, the shard_map flash mesh is registered, and the stock GSPMD
    flash path is disabled (it can't partition Pallas custom calls)."""
    import egom2p_tpu.ops.flash_attention as fa
    from egom2p_tpu.cli.eval_common import (_tensor_parallel_params,
                                            build_argparser)
    from egom2p_tpu.ops.attention import set_tp_flash_mesh, tp_flash_mesh

    args = build_argparser("x").parse_args(["--tensor_parallel", "2"])
    assert args.tensor_parallel == 2

    params = {"encoder": {"qkv": {"kernel": jnp.zeros((64, 192))},
                          "norm": {"scale": jnp.zeros((64,))}}}
    try:
        out = _tensor_parallel_params(params, 2)
        assert "model" in str(out["encoder"]["qkv"]["kernel"].sharding.spec)
        assert tp_flash_mesh() is not None
        assert not fa.supports_flash()  # stock path off under TP serving
    finally:
        set_tp_flash_mesh(None)
        fa.disable_flash(False)

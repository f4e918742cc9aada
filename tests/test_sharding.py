"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

pytestmark = pytest.mark.slow

from egom2p_tpu.core.mesh import MeshConfig, make_mesh, num_data_shards
from egom2p_tpu.core.optim import create_optimizer
from egom2p_tpu.core.schedules import as_optax_schedule, cosine_scheduler
from egom2p_tpu.models.egom2p import create_model
from egom2p_tpu.train.egom2p_train import (TrainState, init_train_state,
                                           jit_train_step, make_train_step)
from tests.test_model import MODALITY_INFO, MODS4, make_mod_dict


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert num_data_shards(mesh) == 8


@pytest.mark.parametrize("accum", [1, 2])
def test_sharded_train_step(accum):
    mesh = make_mesh()
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                         in_domains=MODS4, out_domains=MODS4,
                         modality_info=MODALITY_INFO)
    rng = np.random.default_rng(0)
    B = 8 * accum  # one example per device per microstep
    md = make_mod_dict(rng, batch=B, mods=MODS4, n_in=24, n_tgt=24)
    params = model.init(jax.random.PRNGKey(0), md, 24, 24)

    sched = as_optax_schedule(cosine_scheduler(1e-4, 0.0, 2, 4, warmup_steps=2))
    optimizer = create_optimizer(params, sched, weight_decay=0.05, clip_grad=1.0)
    state = init_train_state(params, optimizer)
    step = make_train_step(model, optimizer, 24, 24, "mod", accum_steps=accum)
    jstep = jit_train_step(mesh, step, state, md)

    losses = []
    key = jax.random.PRNGKey(0)
    for i in range(3):
        key, k = jax.random.split(key)
        state, metrics = jstep(state, md, k)
        losses.append(float(metrics["loss"]))
        assert np.isfinite(losses[-1])
        assert np.isfinite(float(metrics["grad_norm"]))
    assert int(state.step) == 3
    # training on a fixed batch must reduce loss
    assert losses[-1] < losses[0]


def test_dp_grads_match_single_device():
    """Data-parallel sharded step must produce the same update as an
    unsharded step (XLA psum == DDP all-reduce)."""
    mesh = make_mesh()
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                         in_domains=("tok_cam", "tok_gaze"),
                         out_domains=("tok_cam", "tok_gaze"),
                         modality_info=MODALITY_INFO,
                         compute_dtype="float32")  # exact cross-sharding math
    rng = np.random.default_rng(1)
    md = make_mod_dict(rng, batch=8, mods=("tok_cam", "tok_gaze"),
                       n_in=8, n_tgt=8)
    params = model.init(jax.random.PRNGKey(0), md, 8, 8)
    sched = as_optax_schedule(cosine_scheduler(1e-4, 0, 1, 4))
    optimizer = create_optimizer(params, sched)
    state = init_train_state(params, optimizer)
    step = make_train_step(model, optimizer, 8, 8)

    k = jax.random.PRNGKey(3)
    # plain jit first: the sharded step donates (and invalidates) its input
    # state buffers
    st_plain, m_plain = jax.jit(step)(
        init_train_state(params, optimizer), md, k)
    sharded = jit_train_step(mesh, step, state, md)
    st_sharded, m_sharded = sharded(state, md, k)
    assert np.allclose(float(m_sharded["loss"]), float(m_plain["loss"]),
                       rtol=1e-5)
    assert np.allclose(float(m_sharded["grad_norm"]),
                       float(m_plain["grad_norm"]), rtol=1e-4)
    # Adam's m/sqrt(v) amplifies reduction-order noise to ~2*lr for grads near
    # zero, so parameter agreement is bounded by the step size (1e-4 here).
    a = jax.tree_util.tree_leaves(st_sharded.params)
    b = jax.tree_util.tree_leaves(st_plain.params)
    for x, y in zip(a, b):
        assert np.abs(np.asarray(x) - np.asarray(y)).max() < 3e-4


def test_vqvae_codebook_sync_shard_map():
    """Distributed VQ codebook EMA: shard_map + psum over the data axis must
    match the single-device update on the concatenated batch (the reference's
    all_reduce'd EMA, quantize_lucid.py:91-135)."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P
    from jax import shard_map
    from egom2p_tpu.ops.vq import VQConfig, init_vq_state, vq_forward

    cfg = VQConfig(codebook_size=16, dim=4, decay=0.9,
                   threshold_ema_dead_code=0.0, use_cosine_sim=True)
    state = init_vq_state(cfg, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(16, 6, 4)),
                    jnp.float32)

    # single-device reference update
    _, _, _, ref_state = vq_forward(cfg, state, x, training=True, rng=None)

    mesh = make_mesh()

    def local_step(state, xs):
        _, _, _, new_state = vq_forward(cfg, state, xs, training=True,
                                        rng=None, axis_name="data")
        return new_state

    sharded = shard_map(
        local_step, mesh=mesh,
        in_specs=(jax.tree_util.tree_map(lambda _: P(), state),
                  P(("replica", "data"))),
        out_specs=jax.tree_util.tree_map(lambda _: P(), state),
        check_vma=False)  # psum covers 'data' only; replica variance is ours
    sh_state = sharded(state, x)
    assert np.allclose(np.asarray(ref_state.embed), np.asarray(sh_state.embed),
                       atol=1e-5)
    assert np.allclose(np.asarray(ref_state.cluster_size),
                       np.asarray(sh_state.cluster_size), atol=1e-5)


def test_fsdp_matches_replicated():
    """FSDP param/moment sharding must produce the same step as replicated
    data parallelism (it only changes the storage layout)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _make_batch
    from egom2p_tpu.core.mesh import MeshConfig, make_mesh
    from egom2p_tpu.core.optim import create_optimizer
    from egom2p_tpu.core.schedules import as_optax_schedule, cosine_scheduler
    from egom2p_tpu.data.modality_info import make_scaled_modality_info
    from egom2p_tpu.models.egom2p import create_model
    from egom2p_tpu.train.egom2p_train import (init_train_state,
                                               jit_train_step, make_train_step)

    mesh = make_mesh(MeshConfig(replica=1, data=-1))
    mods = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")
    info = make_scaled_modality_info()
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                         in_domains=mods, out_domains=mods,
                         modality_info=info,
                         compute_dtype="float32")  # exact cross-sharding math
    batch = _make_batch(8, mods, info, 24, 24)
    params = model.init(jax.random.PRNGKey(0), batch, 24, 24)
    sched = as_optax_schedule(cosine_scheduler(1e-3, 0.0, 1, 4))
    rng = jax.random.PRNGKey(7)

    results = {}
    for fsdp in (False, True):
        # fresh copies: jit_train_step donates the state buffers
        p = jax.tree_util.tree_map(jnp.array, params)
        optimizer = create_optimizer(p, sched, weight_decay=0.05,
                                     clip_grad=1.0)
        state = init_train_state(p, optimizer)
        step = make_train_step(model, optimizer, 24, 24, "mod")
        jstep = jit_train_step(mesh, step, state, batch, fsdp=fsdp)
        new_state, metrics = jstep(state, batch, rng)
        results[fsdp] = (float(metrics["loss"]),
                         jax.tree_util.tree_map(np.asarray, new_state.params))

    # sharded collectives reorder float reductions; differences must stay at
    # numerical-noise level (adam normalization amplifies grad eps slightly:
    # observed worst case is a single element at ~1.5e-4 of the 1e-3 lr)
    np.testing.assert_allclose(results[False][0], results[True][0], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(results[False][1]),
                    jax.tree_util.tree_leaves(results[True][1])):
        np.testing.assert_allclose(a, b, atol=2e-4)  # < 20% of one lr step


def test_fsdp_actually_shards_large_params():
    from jax.sharding import PartitionSpec as P

    from egom2p_tpu.train.egom2p_train import fsdp_spec
    assert fsdp_spec((64000, 768), 8) == P("data", None)
    assert fsdp_spec((768, 2048), 8) == P(None, "data")
    assert fsdp_spec((7,), 8) == P()          # too small
    assert fsdp_spec((130001, 3), 8) == P()   # no divisible dim


def test_tensor_parallel_matches_replicated():
    """Megatron-style TP (model axis 2, tp_spec column/row/vocab-parallel
    params) must reproduce the replicated-DP step: sharding annotations only
    change layout, XLA inserts the collectives (SURVEY.md §7 recipe)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _make_batch
    from egom2p_tpu.core.mesh import MeshConfig, make_mesh
    from egom2p_tpu.core.optim import create_optimizer
    from egom2p_tpu.core.schedules import as_optax_schedule, cosine_scheduler
    from egom2p_tpu.data.modality_info import make_scaled_modality_info
    from egom2p_tpu.models.egom2p import create_model
    from egom2p_tpu.train.egom2p_train import (init_train_state,
                                               jit_train_step,
                                               make_train_step, tp_spec)

    mods = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")
    info = make_scaled_modality_info()
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                         in_domains=mods, out_domains=mods,
                         modality_info=info,
                         compute_dtype="float32")  # exact cross-sharding math
    batch = _make_batch(8, mods, info, 24, 24)
    params = model.init(jax.random.PRNGKey(0), batch, 24, 24)
    sched = as_optax_schedule(cosine_scheduler(1e-3, 0.0, 1, 4))
    rng = jax.random.PRNGKey(7)

    from jax.sharding import NamedSharding
    from egom2p_tpu.core.mesh import BATCH_SPEC, REPLICATED_SPEC

    def loss_fn(p, b):
        loss, _ = model.apply(p, b, 24, 24, "mod")
        return loss

    from egom2p_tpu.train.egom2p_train import tp_param_shardings

    results = {}
    for tp in (False, True):
        mesh = make_mesh(MeshConfig(replica=1, data=-1,
                                    model=2 if tp else 1))
        shardings = (tp_param_shardings(mesh, params, 2) if tp else
                     jax.tree_util.tree_map(
                         lambda _: NamedSharding(mesh, REPLICATED_SPEC),
                         params))
        p = jax.device_put(params, shardings)
        b = jax.device_put(batch, NamedSharding(mesh, BATCH_SPEC))
        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(p, b)
        results[tp] = (float(loss),
                       jax.tree_util.tree_map(np.asarray, grads))

    # loss and RAW gradients must agree — comparing post-Adam params would
    # amplify reduction-order eps to a full lr step on near-zero-grad params
    np.testing.assert_allclose(results[False][0], results[True][0],
                               rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(results[False][1]),
                    jax.tree_util.tree_leaves(results[True][1])):
        np.testing.assert_allclose(a, b, atol=5e-5)

    # the full optimizer step also runs sharded (smoke: finite loss)
    mesh = make_mesh(MeshConfig(replica=1, data=-1, model=2))
    p = jax.tree_util.tree_map(jnp.array, params)
    optimizer = create_optimizer(p, sched, weight_decay=0.05, clip_grad=1.0)
    state = init_train_state(p, optimizer)
    step = make_train_step(model, optimizer, 24, 24, "mod")
    jstep = jit_train_step(mesh, step, state, batch, tp=True)
    _, metrics = jstep(state, batch, rng)
    assert np.isfinite(float(metrics["loss"]))

    # the rule actually shards the big tensors on the model axis
    from jax.tree_util import tree_leaves_with_path
    specs = {"/".join(str(getattr(s, "key", s)) for s in path):
             tp_spec(path, leaf.shape, 2)
             for path, leaf in tree_leaves_with_path(params)
             if hasattr(leaf, "shape") and leaf.ndim >= 1}
    sharded = [k for k, v in specs.items() if "model" in str(v)]
    assert any("qkv/kernel" in k for k in sharded), sharded[:5]
    assert any("fc2/kernel" in k for k in sharded)
    assert any("token_emb" in k for k in sharded)


def test_tp_fsdp_compose():
    """TP x ZeRO: --tensor_parallel with --fsdp shards tp-matched params on
    the model axis and the rest on the data axis; the composed step must
    still reproduce the replicated loss."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _make_batch
    from egom2p_tpu.core.mesh import MeshConfig, make_mesh
    from egom2p_tpu.core.optim import create_optimizer
    from egom2p_tpu.core.schedules import as_optax_schedule, cosine_scheduler
    from egom2p_tpu.data.modality_info import make_scaled_modality_info
    from egom2p_tpu.models.egom2p import create_model
    from egom2p_tpu.train.egom2p_train import (init_train_state,
                                               jit_train_step,
                                               make_train_step,
                                               state_shardings)

    mods = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")
    info = make_scaled_modality_info()
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                         in_domains=mods, out_domains=mods,
                         modality_info=info,
                         compute_dtype="float32")  # exact cross-sharding math
    batch = _make_batch(8, mods, info, 24, 24)
    params = model.init(jax.random.PRNGKey(0), batch, 24, 24)
    sched = as_optax_schedule(cosine_scheduler(1e-3, 0.0, 1, 4))
    rng = jax.random.PRNGKey(7)

    losses = {}
    for mode in ("repl", "tp_fsdp"):
        mesh = make_mesh(MeshConfig(replica=1, data=-1,
                                    model=2 if mode == "tp_fsdp" else 1))
        p = jax.tree_util.tree_map(jnp.array, params)
        optimizer = create_optimizer(p, sched, weight_decay=0.05,
                                     clip_grad=1.0)
        state = init_train_state(p, optimizer)
        step = make_train_step(model, optimizer, 24, 24, "mod")
        jstep = jit_train_step(mesh, step, state, batch,
                               fsdp=(mode == "tp_fsdp"),
                               tp=(mode == "tp_fsdp"))
        _, metrics = jstep(state, batch, rng)
        losses[mode] = float(metrics["loss"])
        if mode == "tp_fsdp":
            # both axes are genuinely in use in the sharding assignment
            sh = state_shardings(mesh, state, fsdp=True, tp=True)
            specs = [str(s.spec) for s in jax.tree_util.tree_leaves(sh)]
            assert any("model" in s for s in specs), specs[:5]
            assert any("data" in s for s in specs), specs[:5]
    np.testing.assert_allclose(losses["repl"], losses["tp_fsdp"], rtol=1e-5)


def test_tp_shard_mapped_flash64_matches_dense(monkeypatch):
    """Under tensor parallelism the hd-64 training kernels run per
    model-axis shard via shard_map (attention is head-parallel, so no
    collectives are needed inside the kernel).  The TP=2 sharded loss and
    parameter gradients must reproduce the unsharded dense path, the kernel
    must actually fire, and meshes that leave an odd head-pair count per
    shard must fall back (return None -> XLA attention)."""
    import egom2p_tpu.ops.flash64_train as f64t
    import egom2p_tpu.ops.flash_attention as fa
    from egom2p_tpu.models.transformer import _try_flash64
    from egom2p_tpu.ops import attention as attn_mod
    from jax.sharding import NamedSharding
    from egom2p_tpu.core.mesh import BATCH_SPEC
    from tests.test_model import make_mod_dict as _mmd

    # all four modalities at REAL sizes (tests.test_model's scaled registry
    # tops out below the kernel's 256x256 eligibility gate); width 768/12
    # heads is the smallest TP2-eligible shape (3D posemb needs dim%6==0,
    # and tp=2 must leave an EVEN head count = whole 128-lane pairs/shard)
    from egom2p_tpu.data.modality_info import MODALITY_INFO as FULL_INFO
    mods = MODS4
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias",
                         in_domains=mods, out_domains=mods,
                         modality_info=FULL_INFO, dim=768, num_heads=12)
    rng = np.random.default_rng(11)
    md = _mmd(rng, batch=4, mods=mods, n_in=256, n_tgt=256, info=FULL_INFO)
    params = model.init(jax.random.PRNGKey(0), md, 256, 256)

    def loss_fn(p, b):
        loss, _ = model.apply(p, b, 256, 256, "mod")
        return loss

    # dense unsharded baseline (CPU: supports_flash() False, no TP mesh)
    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_fn))(params, md)

    calls = {"n": 0}
    real = f64t.flash64_train_attention

    def counted(*a, **kw):
        calls["n"] += 1
        return real(*a, **{**kw, "interpret": True})

    monkeypatch.setattr(f64t, "flash64_train_attention", counted)
    monkeypatch.setattr(fa, "flash_backend_available", lambda: True)
    mesh = make_mesh(MeshConfig(replica=1, data=-1, model=2))
    attn_mod.set_tp_flash_mesh(mesh)
    try:
        from egom2p_tpu.train.egom2p_train import tp_param_shardings
        p = jax.device_put(params, tp_param_shardings(mesh, params, 2))
        b = jax.device_put(md, NamedSharding(mesh, BATCH_SPEC))
        l_tp, g_tp = jax.jit(jax.value_and_grad(loss_fn))(p, b)

        # every attention site routed through the shard_mapped kernel:
        # 6 encoder self + 6 decoder self + 6 decoder cross
        assert calls["n"] >= 18, calls["n"]
        np.testing.assert_allclose(float(l_tp), float(l_ref), rtol=1e-2)
        for a, r in zip(jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(np.asarray, g_tp)),
                jax.tree_util.tree_leaves(
                jax.tree_util.tree_map(np.asarray, g_ref))):
            a = np.asarray(a, np.float32)
            r = np.asarray(r, np.float32)
            scale = max(np.abs(r).max(), 1e-3)
            np.testing.assert_allclose(a / scale, r / scale, atol=8e-2)

        # 6-head model x tp=2 -> 3 heads/shard (odd pair count): ineligible
        q6 = jnp.zeros((2, 256, 384), jnp.bfloat16)
        kp6 = jnp.zeros((2, 1, 256), bool)
        assert _try_flash64(q6, q6, q6, kp6, 6, False) is None
    finally:
        attn_mod.set_tp_flash_mesh(None)


def test_tp_sharded_checkpoint_restores_across_topologies(tmp_path):
    """A TrainState saved while TP-sharded (model axis 2) must restore
    bit-exact as host numpy with no mesh at all (elastic resume: the
    reference's auto_load_model never depends on world size), and onto a
    different sharding (replicated DP) via the target path."""
    from egom2p_tpu.core.checkpoint import load_checkpoint, save_checkpoint
    from egom2p_tpu.core.mesh import MeshConfig
    from egom2p_tpu.train.egom2p_train import tp_param_shardings

    mesh = make_mesh(MeshConfig(replica=1, data=-1, model=2))
    rng = np.random.default_rng(0)
    params = {"qkv": {"kernel": jnp.asarray(rng.normal(size=(64, 192)),
                                            jnp.float32)},
              "norm": {"scale": jnp.asarray(rng.normal(size=(64,)),
                                            jnp.float32)}}
    sharded = jax.device_put(params, tp_param_shardings(mesh, params, 2))
    assert "model" in str(sharded["qkv"]["kernel"].sharding.spec)
    path = save_checkpoint(str(tmp_path), "tp", sharded)

    # 1) host-numpy restore, no mesh/topology required
    restored = load_checkpoint(path)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # 2) restore onto a different (replicated) sharding via target
    from jax.sharding import NamedSharding
    from egom2p_tpu.core.mesh import REPLICATED_SPEC
    repl = NamedSharding(make_mesh(), REPLICATED_SPEC)
    target = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=repl),
        params)
    restored2 = load_checkpoint(path, target=target)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

"""Tests for the long-tail components: folder dataset, ResidualFSQ/LFQ,
parameter freezing."""
import numpy as np
import pytest


def test_folder_dataset(tmp_path):
    from egom2p_tpu.data.folder_dataset import MultiModalFolderDataset
    for mod in ("rgb", "cam"):
        (tmp_path / mod).mkdir()
        for i in range(4):
            np.save(tmp_path / mod / f"k{i}.npy", np.full(3, i))
    np.save(tmp_path / "rgb" / "extra.npy", np.zeros(3))
    ds = MultiModalFolderDataset({"tok_rgb": str(tmp_path / "rgb"),
                                  "tok_cam": str(tmp_path / "cam")})
    assert len(ds) == 4
    s = ds[1]
    assert s["__key__"] == "k1"
    assert np.array_equal(s["tok_rgb"], s["tok_cam"])


def test_residual_fsq_roundtrip():
    import jax.numpy as jnp
    from egom2p_tpu.ops.fsq import ResidualFSQ
    q = ResidualFSQ((8, 8, 8, 5, 5, 5), num_quantizers=3)
    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 10, 6)),
                    jnp.float32)
    idx, codes = q(z)
    assert idx.shape == (2, 3, 10)
    rec = q.indices_to_codes(idx)
    assert np.allclose(np.asarray(rec), np.asarray(codes), atol=1e-5)
    # residual refinement: 3 stages approximate better than 1
    from egom2p_tpu.ops.fsq import FSQ
    single = FSQ((8, 8, 8, 5, 5, 5))(z)[1]
    err3 = float(np.abs(np.asarray(codes) - np.asarray(z)).mean())
    err1 = float(np.abs(np.asarray(single) - np.asarray(z)).mean())
    assert err3 < err1


def test_lfq_roundtrip():
    import jax.numpy as jnp
    from egom2p_tpu.ops.fsq import LFQ
    q = LFQ(10)
    assert q.codebook_size == 1024
    z = jnp.asarray(np.random.default_rng(0).normal(size=(4, 10)), jnp.float32)
    idx, codes = q(z)
    assert np.array_equal(np.asarray(codes), np.sign(np.asarray(z)))
    rec = q.indices_to_codes(idx)
    assert np.array_equal(np.asarray(rec), np.asarray(codes))


def test_freeze_until():
    import jax
    import jax.numpy as jnp
    import optax
    from egom2p_tpu.core.optim import freeze_until
    params = {"trunk": jnp.ones(3), "emb": jnp.ones(3)}
    mask = {"trunk": True, "emb": False}
    inner = optax.chain(optax.clip_by_global_norm(1.0), optax.sgd(1.0))
    tx = freeze_until(2, mask, inner)
    state = tx.init(params)
    g = {"trunk": jnp.full(3, 100.0), "emb": jnp.ones(3)}
    for step in range(3):
        updates, state = tx.update(g, state, params)
        if step < 2:
            assert float(jnp.abs(updates["trunk"]).max()) == 0.0
            # frozen grads are zeroed BEFORE clipping: the huge trunk grad
            # must not crush the trainable update (reference computes the
            # norm over trainable params only)
            assert float(jnp.abs(updates["emb"]).max()) > 0.5
        else:
            assert float(jnp.abs(updates["trunk"]).max()) > 0.0
        assert float(jnp.abs(updates["emb"]).max()) > 0.0


def test_shared_params_mask():
    import jax
    from egom2p_tpu.core.optim import shared_params_mask
    from egom2p_tpu.models.egom2p import create_model
    from tests.test_model import MODALITY_INFO, MODS4, make_mod_dict
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias", MODS4, MODS4,
                         modality_info=MODALITY_INFO)
    md = make_mod_dict(np.random.default_rng(0), batch=1, n_in=8, n_tgt=8)
    params = model.init(jax.random.PRNGKey(0), md, 8, 8)
    mask = shared_params_mask(params)
    flat = jax.tree_util.tree_leaves_with_path(mask)
    frozen = [p for p, v in flat if v]
    unfrozen = [p for p, v in flat if not v]
    assert any("encoder_0" in str(p) for p in frozen)
    assert any("mod_emb" in str(p) or "embeddings" in str(p) for p in unfrozen)
    # decoder_proj_context stays trainable (reference freeze_shared_params
    # only freezes encoder/decoder blocks + norms, egom2p_model.py:805-807)
    assert all("decoder_proj_context" not in str(p) for p in frozen)


@pytest.mark.slow
def test_fm_from_pretrained_orbax(tmp_path):
    """FM hub wrapper (reference: egom2p_model.py:826-880): config.json +
    orbax checkpoint dir -> bound, callable model."""
    import json

    import jax
    import jax.numpy as jnp

    from egom2p_tpu.core.checkpoint import save_checkpoint
    from egom2p_tpu.data.modality_info import MODALITY_INFO
    from egom2p_tpu.models.hub import FM, _model_from_config

    cfg = dict(domains_in=["tok_cam", "tok_gaze"],
               domains_out=["tok_cam", "tok_gaze"],
               dim=96, encoder_depth=1, decoder_depth=1, num_heads=4,
               mlp_ratio=2.0, qkv_bias=False, proj_bias=False, mlp_bias=False,
               norm_bias=False, gated_mlp=True, qk_norm=False,
               act_layer="SiLU")
    model = _model_from_config(cfg)
    md = {}
    for m in cfg["domains_in"]:
        L = MODALITY_INFO[m]["max_tokens"]
        md[m] = {"tensor": jnp.zeros((1, L), jnp.int32),
                 "input_mask": jnp.ones((1, L), bool),
                 "target_mask": jnp.zeros((1, L), bool),
                 "decoder_attention_mask": jnp.zeros((1, L), jnp.int32)}
    params = jax.jit(lambda k: model.init(k, md, 8, 8))(jax.random.PRNGKey(0))
    save_checkpoint(str(tmp_path), 3, {"params": params["params"]})
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg, f)

    fm = FM.from_pretrained(str(tmp_path))
    loss, _ = fm(md, 8, 8, "mod")
    assert np.isfinite(float(loss))
    # converted params match the saved ones exactly
    ref = jax.tree_util.tree_leaves(params["params"])
    got = jax.tree_util.tree_leaves(fm.params["params"])
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(ref, got))


def test_fm_hub_id_gated():
    from egom2p_tpu.models.hub import FM
    with pytest.raises(RuntimeError, match="egress"):
        FM.from_pretrained("org/model-that-needs-download")


def test_s3_paths_gated():
    """s3:// shards route through the boto3-gated shim with a clear error
    here (zero egress), and parse correctly."""
    from egom2p_tpu.data.s3_utils import is_s3_path, parse_s3_path, open_stream
    assert is_s3_path("s3://bucket/key/shard-0.tar")
    assert not is_s3_path("/data/shard-0.tar")
    assert parse_s3_path("s3://b/k/x.tar") == ("b", "k/x.tar")
    with pytest.raises(RuntimeError, match="egress"):
        open_stream("s3://bucket/key.tar")
    from egom2p_tpu.data.tar_reader import iter_tar_samples
    with pytest.raises(RuntimeError, match="egress"):
        list(iter_tar_samples("s3://bucket/key.tar"))


def test_async_checkpoint_roundtrip(tmp_path):
    """Async (non-blocking) saves commit after wait_for_saves and restore
    identically; in-flight orbax tmp dirs never win latest_checkpoint."""
    import jax.numpy as jnp
    from egom2p_tpu.core.checkpoint import (latest_checkpoint,
                                            load_checkpoint, save_checkpoint,
                                            wait_for_saves)

    state = {"params": {"w": jnp.arange(6.0).reshape(2, 3)},
             "step": jnp.asarray(7)}
    path = save_checkpoint(str(tmp_path), 2, state, blocking=False)
    # a second async save joins the first (one in-flight save at a time)
    path5 = save_checkpoint(str(tmp_path), 5, state, blocking=False)
    wait_for_saves()
    assert latest_checkpoint(str(tmp_path)) == path5
    for p in (path, path5):
        got = load_checkpoint(p)
        np.testing.assert_array_equal(got["params"]["w"],
                                      np.arange(6.0).reshape(2, 3))
        assert int(got["step"]) == 7
    # a stale orbax tmp dir (crash mid-async-write) is not a resume target
    (tmp_path / "checkpoint-9.orbax-checkpoint-tmp-123").mkdir()
    assert latest_checkpoint(str(tmp_path)) == path5


def test_multimodal_dataset_folder_class_tree(tmp_path):
    """Class-folder image-tree dataset (round-3 VERDICT item 9; reference:
    egom2p/data/multimodal_dataset_folder.py:204-369)."""
    from PIL import Image

    from egom2p_tpu.data.folder_dataset import MultiModalDatasetFolder
    from egom2p_tpu.data.modality_transforms import RGBTransform

    rng = np.random.default_rng(0)
    names = {"cls_a": ["x0", "x1"], "cls_b": ["y0"]}
    for mod, ext in (("rgb", "jpg"), ("depth", "png")):
        for cls, files in names.items():
            d = tmp_path / mod / cls
            d.mkdir(parents=True)
            for n in files:
                img = rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)
                Image.fromarray(img).save(d / f"{n}.{ext}")
    # a tok modality stored as per-class npy trees
    for cls, files in names.items():
        d = tmp_path / "tok_cam" / cls
        d.mkdir(parents=True)
        for n in files:
            np.save(d / f"{n}.npy", rng.integers(0, 256, 30))

    ds = MultiModalDatasetFolder(
        str(tmp_path), ["rgb", "depth", "tok_cam"],
        modality_transforms={"rgb": RGBTransform()}, return_path=True)
    assert ds.classes == ["cls_a", "cls_b"]
    assert len(ds) == 3
    s = ds[0]
    assert s["class_idx"] == 0 and s["class_id"] == "cls_a"
    assert s["file_name"] == "x0"
    assert s["rgb"].shape == (16, 16, 3)
    assert s["depth"].shape == (16, 16, 3)
    assert s["tok_cam"].shape == (30,)
    assert ds[2]["class_idx"] == 1  # cls_b

    # max_samples takes a seeded subset; pre_shuffle permutes alignment-safe
    ds2 = MultiModalDatasetFolder(
        str(tmp_path), ["rgb", "tok_cam"], max_samples=2, pre_shuffle=True)
    assert len(ds2) == 2

    # cache returns identical content without reloading
    ds3 = MultiModalDatasetFolder(str(tmp_path), ["tok_cam"], cache=True)
    a, b = ds3[1], ds3[1]
    assert np.array_equal(a["tok_cam"], b["tok_cam"]) and 1 in ds3.cache

    # misaligned trees raise
    extra = tmp_path / "rgb" / "cls_a" / "zz.jpg"
    Image.fromarray(np.zeros((4, 4, 3), np.uint8)).save(extra)
    with pytest.raises(RuntimeError, match="misaligned"):
        MultiModalDatasetFolder(str(tmp_path), ["rgb", "depth"])

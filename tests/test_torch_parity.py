"""Numerical parity tests against the actual reference PyTorch implementation.

The reference repo at /root/reference is importable on CPU torch (loguru is
stubbed).  These tests random-initialize the reference networks, convert the
weights with egom2p_tpu.compat.torch_convert, and compare outputs — the
strongest possible check that the TPU reimplementation + checkpoint converter
reproduce the reference (SURVEY.md §7 "hard parts").
"""
import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.slow

# --- make the reference importable (APPEND so the reference's root-level
# run_training_*.py never shadow this repo's) ---------------------------------
sys.path.append("/root/reference")
_fake_loguru = types.ModuleType("loguru")


class _Logger:
    def info(self, *a, **k):
        pass

    def warning(self, *a, **k):
        pass


_fake_loguru.logger = _Logger()
sys.modules.setdefault("loguru", _fake_loguru)

import importlib.machinery


class _AnyAttrModule(types.ModuleType):
    """Stub module that fabricates a permissive dummy class for any attribute
    (the reference constructs torchvision transforms at import time)."""

    def __getattr__(self, name):
        if name.startswith("__"):
            raise AttributeError(name)

        class _Dummy:
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                return a[0] if a else None

        _Dummy.__name__ = name
        return _Dummy


def _stub(name, any_attr=False):
    m = (_AnyAttrModule(name) if any_attr else types.ModuleType(name))
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    m.__path__ = []  # mark as package so submodule imports resolve via sys.modules
    return m


# stub torchvision (only used by the reference for denormalize/transforms,
# not on the code paths under test)
_tv = _stub("torchvision")
_tvt = _stub("torchvision.transforms", any_attr=True)
_tvf = _stub("torchvision.transforms.functional", any_attr=True)
_tvf.normalize = lambda x, mean, std: x
_tvt.functional = _tvf
_tv.transforms = _tvt
_tvo = _stub("torchvision.ops")
_tvom = _stub("torchvision.ops.misc")
_tvom.FrozenBatchNorm2d = type("FrozenBatchNorm2d", (), {})
sys.modules.setdefault("torchvision", _tv)
sys.modules.setdefault("torchvision.transforms", _tvt)
sys.modules.setdefault("torchvision.transforms.functional", _tvf)
sys.modules.setdefault("torchvision.ops", _tvo)
sys.modules.setdefault("torchvision.ops.misc", _tvom)
_tvd = _stub("torchvision.datasets")
_tvdv = _stub("torchvision.datasets.vision")
_tvdv.VisionDataset = type("VisionDataset", (), {})
sys.modules.setdefault("torchvision.datasets", _tvd)
sys.modules.setdefault("torchvision.datasets.vision", _tvdv)
for _name in ("boto3", "boto3.s3", "boto3.s3.transfer", "botocore", "wandb",
              "webdataset", "webdataset.handlers", "braceexpand", "decord",
              "mediapy"):
    sys.modules.setdefault(_name, _stub(_name))
sys.modules["boto3.s3.transfer"].TransferConfig = type("TransferConfig", (), {})
sys.modules["webdataset.handlers"].reraise_exception = lambda e: None
sys.modules["webdataset.handlers"].warn_and_continue = lambda e: True
_wf = _stub("webdataset.filters")
_wf.pipelinefilter = lambda f: f
_wf.reraise_exception = lambda e: None
sys.modules.setdefault("webdataset.filters", _wf)
_alb = _stub("albumentations")
_alb.ReplayCompose = type("ReplayCompose", (), {})
sys.modules.setdefault("albumentations", _alb)
try:
    import cv2  # noqa: F401  real cv2 when present: the SAM transforms use it
except ImportError:  # pragma: no cover
    sys.modules.setdefault("cv2", _stub("cv2"))
sys.modules["decord"].VideoReader = type("VideoReader", (), {})
sys.modules["decord"].cpu = lambda *a: None

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


# ============================================================ Cosmos tokenizer
@pytest.fixture(scope="module")
def cosmos_pair():
    from cosmos_tokenizer.networks.discrete_video import (
        CausalDiscreteVideoTokenizer as TorchDV)
    from egom2p_tpu.tokenizers.cosmos.network import (
        CausalDiscreteVideoTokenizer as JaxDV, DiscreteVideoConfig)
    from egom2p_tpu.compat.torch_convert import convert_cosmos_state_dict

    kwargs = dict(attn_resolutions=[32], channels=16, channels_mult=[1, 2, 2],
                  dropout=0.0, in_channels=3, num_res_blocks=2, out_channels=3,
                  resolution=1024, patch_size=4, patch_method="haar",
                  z_factor=1, num_groups=1, legacy_mode=False,
                  spatial_compression=8, temporal_compression=4,
                  quantizer="FSQ", embedding_dim=6, levels=[8, 8, 8, 5, 5, 5],
                  encoder="FACTORIZED", decoder="FACTORIZED", name="DV")
    torch.manual_seed(0)
    tmodel = TorchDV(z_channels=8, **kwargs).eval()
    # the reference quantizer emits bf16 by default (quantizers.py:92);
    # keep the CPU comparison in fp32
    tmodel.quantizer.dtype = torch.float32

    cfg = DiscreteVideoConfig(channels=16, channels_mult=(1, 2, 2), z_channels=8)
    jmodel = JaxDV(cfg)
    x0 = jnp.zeros((1, 9, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: jmodel.init(k, x0), jax.random.PRNGKey(0))
    params = convert_cosmos_state_dict(tmodel.state_dict(), shapes)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return tmodel, jmodel, params


def test_cosmos_encode_parity(cosmos_pair):
    tmodel, jmodel, params = cosmos_pair
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(1, 9, 64, 64, 3)).astype(np.float32)

    with torch.no_grad():
        t_idx, t_codes, _ = tmodel.encode(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    j_idx, j_codes = jmodel.apply(params, jnp.asarray(x),
                                  method=type(jmodel).encode)

    t_codes = t_codes.float().numpy().transpose(0, 2, 3, 4, 1)
    j_codes = np.asarray(j_codes, dtype=np.float32)
    assert j_idx.shape == tuple(t_idx.shape)
    # continuous pre-quantization features should match to fp32 tolerance;
    # token indices can differ only where a value sits on a rounding boundary
    match = (np.asarray(j_idx) == t_idx.numpy())
    assert match.mean() > 0.99, f"token match rate {match.mean()}"
    assert np.abs(j_codes - t_codes).max() < 1e-3


def test_cosmos_decode_parity(cosmos_pair):
    tmodel, jmodel, params = cosmos_pair
    rng = np.random.default_rng(1)
    idx = rng.integers(0, 64000, size=(1, 2, 8, 8)).astype(np.int32)

    with torch.no_grad():
        t_out = tmodel.decode_code(torch.from_numpy(idx).long())
    j_out = jmodel.apply(params, jnp.asarray(idx),
                         method=type(jmodel).decode_code)
    t_out = t_out.float().numpy().transpose(0, 2, 3, 4, 1)
    j_out = np.asarray(j_out, dtype=np.float32)
    assert j_out.shape == t_out.shape
    assert np.abs(j_out - t_out).max() < 2e-3, np.abs(j_out - t_out).max()


# ========================================================== cam/gaze VQ-VAE
@pytest.fixture(scope="module")
def vqvae_pair():
    from egom2p.vq.vqvae import VQVAE as TorchVQVAE
    from egom2p_tpu.compat.torch_convert import convert_seq_vqvae_state_dict
    from egom2p_tpu.ops.vq import VQState
    from egom2p_tpu.tokenizers.seq_vqvae import seq_vqvae_from_config

    torch.manual_seed(0)
    tmodel = TorchVQVAE(
        enc_type="CamTransformer", dec_type="CamTransformer",
        init_encoder=False, post_mlp=True, quant_type="lucid",
        codebook_size=256, num_codebooks=1, latent_dim=32, norm_codes=True,
        norm_latents=False, sync_codebook=False, ema_decay=0.99,
        threshold_ema_dead_code=0.25, code_replacement_policy="batch_random",
        commitment_weight=1.0, kmeans_init=False, undo_std=False,
        freeze_enc=False, out_conv=False, n_frames=60, temporal_compress=2,
    ).eval()

    tok = seq_vqvae_from_config("cam", jax.random.PRNGKey(0))
    params, vq = convert_seq_vqvae_state_dict(tmodel.state_dict(), tok.params)
    tok.params = jax.tree_util.tree_map(jnp.asarray, params)
    tok.vq_state = VQState(embed=jnp.asarray(vq["embed"]),
                           cluster_size=jnp.asarray(vq["cluster_size"]),
                           initted=jnp.asarray(vq["initted"]))
    return tmodel, tok


def test_vqvae_tokenize_parity(vqvae_pair):
    tmodel, tok = vqvae_pair
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 60, 9)).astype(np.float32)

    with torch.no_grad():
        t_tokens = tmodel.tokenize(torch.from_numpy(x)).numpy()
    j_tokens = np.asarray(tok.tokenize(jnp.asarray(x)))
    assert j_tokens.shape == t_tokens.shape == (2, 30)
    match = (j_tokens == t_tokens).mean()
    assert match > 0.99, f"token match rate {match}"


def test_vqvae_decode_parity(vqvae_pair):
    tmodel, tok = vqvae_pair
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 256, size=(2, 30))

    with torch.no_grad():
        t_rec = tmodel.decode_tokens(torch.from_numpy(tokens).long()).numpy()
    j_rec = np.asarray(tok.decode_tokens(jnp.asarray(tokens)))
    assert j_rec.shape == t_rec.shape == (2, 60, 9)
    # fp32 accumulation drift through 12 transformer blocks differs between
    # CPU-torch and XLA; bound max and mean error
    assert np.abs(j_rec - t_rec).max() < 5e-3, np.abs(j_rec - t_rec).max()
    assert np.abs(j_rec - t_rec).mean() < 2e-3


def test_vqvae_autoencode_parity(vqvae_pair):
    tmodel, tok = vqvae_pair
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 60, 9)).astype(np.float32)
    with torch.no_grad():
        t_rec, _ = tmodel(torch.from_numpy(x))
    j_rec = np.asarray(tok.autoencode(jnp.asarray(x)))
    assert np.abs(j_rec - t_rec.numpy()).max() < 5e-3


# ================================================================== EgoM2P
@pytest.fixture(scope="module")
def egom2p_pair():
    from functools import partial

    import torch.nn as nn
    from egom2p.models.egom2p_model import EgoM2P as TorchEgoM2P
    from egom2p.models.egom2p_utils import LayerNorm as TorchLN
    from egom2p.models.encoder_embeddings import (GazeCamTokenEncoderEmbedding,
                                                  VideoTokenEncoderEmbedding)
    from egom2p.models.decoder_embeddings import (GazeCamTokenDecoderEmbedding,
                                                  VideoTokenDecoderEmbedding)

    from egom2p_tpu.compat.torch_convert import convert_egom2p_state_dict
    from egom2p_tpu.data.modality_info import MODALITY_INFO, generate_uint15_hash
    from egom2p_tpu.models.egom2p import create_model

    mods = ("tok_cam", "tok_gaze")
    tinfo = {m: {"id": generate_uint15_hash(m), "type": MODALITY_INFO[m]["type"],
                 "vocab_size": 256, "max_tokens": 30} for m in mods}

    torch.manual_seed(0)
    enc_emb = {m: GazeCamTokenEncoderEmbedding(vocab_size=256) for m in mods}
    dec_emb = {m: GazeCamTokenDecoderEmbedding(vocab_size=256) for m in mods}
    tmodel = TorchEgoM2P(
        encoder_embeddings=enc_emb, decoder_embeddings=dec_emb,
        modality_info=tinfo, dim=128, encoder_depth=2, decoder_depth=2,
        num_heads=4, mlp_ratio=4, qkv_bias=False, proj_bias=False,
        mlp_bias=False, norm_layer=partial(TorchLN, eps=1e-6, bias=False),
        act_layer=nn.SiLU, gated_mlp=True).eval()

    jinfo = {m: dict(MODALITY_INFO[m]) for m in mods}
    jmodel = create_model("egom2p_tiny_6e_6d_swiglu_nobias", mods, mods,
                          modality_info=jinfo,
                          dim=128, encoder_depth=2, decoder_depth=2,
                          num_heads=4)

    md = _make_md(np.random.default_rng(0), mods)
    md_j = {m: {k: jnp.asarray(v) for k, v in d.items()} for m, d in md.items()}
    shapes = jax.eval_shape(lambda k: jmodel.init(k, md_j, 16, 16),
                            jax.random.PRNGKey(0))
    params = convert_egom2p_state_dict(tmodel.state_dict(), shapes, mods, mods)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return tmodel, jmodel, params, md


def _make_md(rng, mods, L=30, n_in=8, n_tgt=8):
    out = {}
    for m in mods:
        tensor = rng.integers(0, 256, size=(1, L)).astype(np.int64)
        input_mask = np.ones((1, L), dtype=bool)
        target_mask = np.ones((1, L), dtype=bool)
        attn = np.zeros((1, L), dtype=np.int32)
        perm = rng.permutation(L)
        input_mask[0, perm[:n_in]] = False
        target_mask[0, perm[n_in:n_in + n_tgt]] = False
        um = np.where(~target_mask[0])[0]
        attn[0, um[0]] = len(um)
        out[m] = {"tensor": tensor, "input_mask": input_mask,
                  "target_mask": target_mask, "decoder_attention_mask": attn}
    return out


def test_egom2p_loss_parity(egom2p_pair):
    """Same converted weights + same masks => same per-modality losses.
    Budgets are exact (no truncation) so the decoder modality-order shuffle
    cannot change the result."""
    import random

    tmodel, jmodel, params, md = egom2p_pair
    md_t = {m: {k: torch.from_numpy(np.asarray(v)) for k, v in d.items()}
            for m, d in md.items()}
    for m in md_t:
        md_t[m]["input_mask"] = md_t[m]["input_mask"].bool()
        md_t[m]["target_mask"] = md_t[m]["target_mask"].bool()
        md_t[m]["decoder_attention_mask"] = md_t[m]["decoder_attention_mask"].int()

    random.seed(0)
    with torch.no_grad():
        t_loss, t_mod_loss = tmodel(md_t, num_encoder_tokens=16,
                                    num_decoder_tokens=16, loss_type="mod")

    md_j = {m: {k: jnp.asarray(v) for k, v in d.items()} for m, d in md.items()}
    j_loss, j_mod_loss = jmodel.apply(params, md_j, 16, 16, "mod",
                                      compute_dtype=jnp.float32)

    assert abs(float(j_loss) - float(t_loss)) < 2e-3, (
        float(j_loss), float(t_loss))
    for m in t_mod_loss:
        assert abs(float(j_mod_loss[m]) - float(t_mod_loss[m])) < 5e-3, (
            m, float(j_mod_loss[m]), float(t_mod_loss[m]))


# ===================================================== Cosmos BASE variant
def test_cosmos_base_parity():
    """Non-factorized (BASE) encoder/decoder parity vs the reference."""
    from cosmos_tokenizer.networks.discrete_video import (
        CausalDiscreteVideoTokenizer as TorchDV)
    from egom2p_tpu.tokenizers.cosmos.network import (
        CausalDiscreteVideoTokenizer as JaxDV, DiscreteVideoConfig)
    from egom2p_tpu.compat.torch_convert import convert_cosmos_state_dict

    kwargs = dict(attn_resolutions=[32], channels=16, channels_mult=[1, 2, 2],
                  dropout=0.0, in_channels=3, num_res_blocks=1, out_channels=3,
                  resolution=1024, patch_size=4, patch_method="haar",
                  z_factor=1, num_groups=4, legacy_mode=False,
                  quantizer="FSQ", embedding_dim=6, levels=[8, 8, 8, 5, 5, 5],
                  encoder="BASE", decoder="BASE", name="DV")
    torch.manual_seed(0)
    tmodel = TorchDV(z_channels=8, **kwargs).eval()
    tmodel.quantizer.dtype = torch.float32

    cfg = DiscreteVideoConfig(channels=16, channels_mult=(1, 2, 2),
                              num_res_blocks=1, z_channels=8, num_groups=4,
                              encoder="BASE", decoder="BASE")
    jmodel = JaxDV(cfg)
    x0 = jnp.zeros((1, 9, 64, 64, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: jmodel.init(k, x0), jax.random.PRNGKey(0))
    params = convert_cosmos_state_dict(tmodel.state_dict(), shapes)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(1, 9, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_idx, t_codes, _ = tmodel.encode(
            torch.from_numpy(x.transpose(0, 4, 1, 2, 3)))
    j_idx, j_codes = jmodel.apply(params, jnp.asarray(x),
                                  method=type(jmodel).encode)
    t_codes = t_codes.float().numpy().transpose(0, 2, 3, 4, 1)
    assert j_idx.shape == tuple(t_idx.shape)
    match = (np.asarray(j_idx) == t_idx.numpy()).mean()
    assert match > 0.99, f"token match {match}"
    assert np.abs(np.asarray(j_codes, dtype=np.float32) - t_codes).max() < 2e-3

    idx = rng.integers(0, 64000, size=tuple(t_idx.shape)).astype(np.int32)
    with torch.no_grad():
        t_out = tmodel.decode_code(torch.from_numpy(idx).long())
    j_out = jmodel.apply(params, jnp.asarray(idx),
                         method=type(jmodel).decode_code)
    t_out = t_out.float().numpy().transpose(0, 2, 3, 4, 1)
    assert np.abs(np.asarray(j_out, dtype=np.float32) - t_out).max() < 5e-3


def test_egom2p_loss_parity_truncating(egom2p_pair):
    """Budget < available tokens on BOTH encoder and decoder: exercises the
    truncating argsort-gather path (which test_egom2p_loss_parity avoids).
    A single modality is used so the reference's random decoder modality-order
    shuffle (egom2p_model.py:312) cannot change which tokens are truncated —
    the epsilon-argsort tiebreak is then deterministic in both frameworks."""
    import random

    tmodel, jmodel, params, _ = egom2p_pair
    rng = np.random.default_rng(42)
    L, n_in, n_tgt, budget = 30, 20, 20, 12
    tensor = rng.integers(0, 256, size=(1, L)).astype(np.int64)
    input_mask = np.ones((1, L), dtype=bool)
    target_mask = np.ones((1, L), dtype=bool)
    attn = np.zeros((1, L), dtype=np.int32)
    perm = rng.permutation(L)
    input_mask[0, perm[:n_in]] = False
    target_mask[0, perm[: n_tgt]] = False  # overlapping is fine for this test
    um = np.where(~target_mask[0])[0]
    attn[0, um[0]] = len(um)
    md = {"tok_cam": {"tensor": tensor, "input_mask": input_mask,
                      "target_mask": target_mask,
                      "decoder_attention_mask": attn}}

    md_t = {m: {k: torch.from_numpy(np.asarray(v)) for k, v in d.items()}
            for m, d in md.items()}
    md_t["tok_cam"]["input_mask"] = md_t["tok_cam"]["input_mask"].bool()
    md_t["tok_cam"]["target_mask"] = md_t["tok_cam"]["target_mask"].bool()
    md_t["tok_cam"]["decoder_attention_mask"] = \
        md_t["tok_cam"]["decoder_attention_mask"].int()

    random.seed(0)
    with torch.no_grad():
        t_loss, _ = tmodel(md_t, num_encoder_tokens=budget,
                           num_decoder_tokens=budget, loss_type="mod")

    md_j = {m: {k: jnp.asarray(v) for k, v in d.items()}
            for m, d in md.items()}
    j_loss, _ = jmodel.apply(params, md_j, budget, budget, "mod",
                             compute_dtype=jnp.float32)
    assert abs(float(j_loss) - float(t_loss)) < 5e-3, (
        float(j_loss), float(t_loss))


# ========================================= raw-pixel + seq-emb embeddings
def test_image_encoder_embedding_parity():
    """Raw-pixel ImageEncoderEmbedding vs reference (encoder_embeddings.py:395):
    converted proj weights + channels-last patchify must match torch."""
    from egom2p.models.encoder_embeddings import ImageEncoderEmbedding as TorchImg

    from egom2p_tpu.models.embeddings import ImagePatchEncoderEmbedding

    torch.manual_seed(0)
    tm = TorchImg(num_channels=3, patch_size=16, dim_tokens=64,
                  image_size=224).eval()
    jm = ImagePatchEncoderEmbedding(num_channels=3, patch_size=16,
                                    image_size=224, dim=64)

    rng = np.random.default_rng(0)
    img = rng.normal(0, 1, (2, 3, 224, 224)).astype(np.float32)
    with torch.no_grad():
        td = tm({"tensor": torch.from_numpy(img)})

    # convert: torch Linear (out, in) -> flax kernel (in, out)
    w = tm.proj.weight.detach().numpy().T
    mod_emb = tm.mod_emb.detach().numpy()  # (1, 1, D)
    params = {"params": {"proj": {"kernel": jnp.asarray(w)}}}
    img_cl = np.moveaxis(img, 1, -1)  # channels-last for TPU
    x, emb = jm.apply(params, {"tensor": jnp.asarray(img_cl)},
                      jnp.asarray(mod_emb), jnp.float32)
    np.testing.assert_allclose(np.asarray(x), td["x"].numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(emb), td["emb"].numpy(),
                               atol=2e-4, rtol=1e-4)


def test_sequence_emb_encoder_embedding_parity():
    """SequenceEmbEncoderEmbedding vs reference (encoder_embeddings.py:493)."""
    from egom2p.models.encoder_embeddings import \
        SequenceEmbEncoderEmbedding as TorchSeqEmb

    from egom2p_tpu.models.embeddings import SequenceEmbEncoderEmbedding

    torch.manual_seed(1)
    tm = TorchSeqEmb(max_length=16, dim_tokens=64, orig_emb_dim=32).eval()
    jm = SequenceEmbEncoderEmbedding(max_length=16, orig_emb_dim=32, dim=64)

    rng = np.random.default_rng(1)
    embs = rng.normal(0, 1, (2, 16, 32)).astype(np.float32)
    input_mask = np.ones((2, 16), dtype=bool)
    input_mask[0, :5] = False
    input_mask[1, :9] = False
    with torch.no_grad():
        td = tm({"tensor": torch.from_numpy(embs),
                 "input_mask": torch.from_numpy(input_mask)})

    params = {"params": {"emb_proj": {
        "kernel": jnp.asarray(tm.emb_proj.weight.detach().numpy().T),
        "bias": jnp.asarray(tm.emb_proj.bias.detach().numpy())}}}
    x, emb = jm.apply(params,
                      {"tensor": jnp.asarray(embs),
                       "input_mask": jnp.asarray(input_mask)},
                      jnp.asarray(tm.mod_emb.detach().numpy()), jnp.float32)
    np.testing.assert_allclose(np.asarray(x), td["x"].numpy(),
                               atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(emb), td["emb"].numpy(),
                               atol=2e-4, rtol=1e-4)


def test_cosmos_image_parity():
    """2D DI (FSQ) encoder/decoder parity vs the reference
    (cosmos_tokenizer/networks/discrete_image.py + modules/layers2d.py)."""
    from cosmos_tokenizer.networks.discrete_image import (
        DiscreteImageTokenizer as TorchDI)
    from egom2p_tpu.compat.torch_convert import convert_cosmos_image_state_dict
    from egom2p_tpu.tokenizers.cosmos.image_network import (
        DiscreteImageTokenizer as JaxDI, ImageTokenizerConfig)

    kwargs = dict(attn_resolutions=[16], channels=32, channels_mult=[1, 2],
                  dropout=0.0, in_channels=3, spatial_compression=4,
                  num_res_blocks=1, out_channels=3, resolution=32,
                  patch_size=2, patch_method="haar", z_factor=1,
                  quantizer="FSQ", embedding_dim=6, levels=[8, 8, 8, 5, 5, 5],
                  encoder="Default", decoder="Default", name="DI")
    torch.manual_seed(0)
    tmodel = TorchDI(z_channels=16, **kwargs).eval()
    tmodel.quantizer.dtype = torch.float32

    cfg = ImageTokenizerConfig(attn_resolutions=(16,), channels=32,
                               channels_mult=(1, 2), spatial_compression=4,
                               num_res_blocks=1, resolution=32, patch_size=2,
                               z_channels=16, embedding_dim=6)
    jmodel = JaxDI(cfg)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: jmodel.init(k, x0), jax.random.PRNGKey(0))
    params = convert_cosmos_image_state_dict(tmodel.state_dict(), shapes)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_idx, t_codes, _ = tmodel.encode(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    j_idx, j_codes, _ = jmodel.apply(params, jnp.asarray(x),
                                     method=JaxDI.encode)
    t_codes = t_codes.float().numpy().transpose(0, 2, 3, 1)
    assert j_idx.shape == tuple(t_idx.shape)
    match = (np.asarray(j_idx) == t_idx.numpy()).mean()
    assert match > 0.99, f"token match {match}"
    assert np.abs(np.asarray(j_codes, dtype=np.float32) - t_codes).max() < 2e-3

    idx = rng.integers(0, 64000, size=tuple(t_idx.shape)).astype(np.int32)
    with torch.no_grad():
        t_out = tmodel.decode_code(torch.from_numpy(idx).long())
    j_out = jmodel.apply(params, jnp.asarray(idx), method=JaxDI.decode_code)
    t_out = t_out.float().numpy().transpose(0, 2, 3, 1)
    assert np.abs(np.asarray(j_out, dtype=np.float32) - t_out).max() < 5e-3


def test_cosmos_continuous_image_parity():
    """CI (AE formulation) autoencode parity vs the reference
    (cosmos_tokenizer/networks/continuous_image.py:32-104)."""
    from cosmos_tokenizer.networks.continuous_image import (
        ContinuousImageTokenizer as TorchCI)
    from egom2p_tpu.compat.torch_convert import convert_cosmos_image_state_dict
    from egom2p_tpu.tokenizers.cosmos.image_network import (
        ContinuousImageTokenizer as JaxCI, ImageTokenizerConfig)

    kwargs = dict(attn_resolutions=[16], channels=32, channels_mult=[1, 2],
                  dropout=0.0, in_channels=3, spatial_compression=4,
                  num_res_blocks=1, out_channels=3, resolution=32,
                  patch_size=2, patch_method="haar",
                  formulation="AE", encoder="Default", decoder="Default",
                  name="CI")
    torch.manual_seed(0)
    tmodel = TorchCI(z_channels=16, z_factor=1, latent_channels=8,
                     **kwargs).eval()

    cfg = ImageTokenizerConfig(attn_resolutions=(16,), channels=32,
                               channels_mult=(1, 2), spatial_compression=4,
                               num_res_blocks=1, resolution=32, patch_size=2,
                               z_channels=16, z_factor=1, latent_channels=8,
                               formulation="AE")
    jmodel = JaxCI(cfg)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: jmodel.init(k, x0), jax.random.PRNGKey(0))
    params = convert_cosmos_image_state_dict(tmodel.state_dict(), shapes)
    params = jax.tree_util.tree_map(jnp.asarray, params)

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        t_recon = t_out.reconstructions.float().numpy().transpose(0, 2, 3, 1)
        t_latent = t_out.latent.float().numpy().transpose(0, 2, 3, 1)
    j_recon, _post, j_latent = jmodel.apply(params, jnp.asarray(x))
    assert np.abs(np.asarray(j_latent, dtype=np.float32) - t_latent).max() < 2e-3
    assert np.abs(np.asarray(j_recon, dtype=np.float32) - t_recon).max() < 5e-3

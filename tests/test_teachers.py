"""Feature-teacher towers + feature-domain VQ-VAE tests.

Covers the reference's feature-map tokenizer-training path
(reference: run_training_vqvae.py:78 FEAT_MODALITIES, :460-481
get_feature_extractor, :949-1002 feature extraction in load_sample):

  * ViTTeacher output shapes for dense and -global specs,
  * torch->flax weight-converter numerical parity against minimal torch
    models built with the published OpenAI-CLIP / DINOv2 state-dict
    layouts (the same key names the real checkpoints carry),
  * FeatureVQTokenizer roundtrip + train-step smoke,
  * end-to-end trainer run on a tiny registered teacher domain.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egom2p_tpu.models.teachers import (TEACHER_SPECS, TeacherSpec,
                                        ViTTeacher, get_feature_extractor)

_TINY_CLIP = TeacherSpec(name="tiny-clip", patch=8, width=32, depth=2,
                         heads=2, feat_dim=16, mlp="quick_gelu", ln_pre=True,
                         patch_bias=False, proj=True, image_size=16,
                         ln_eps=1e-5)
_TINY_DINO = TeacherSpec(name="tiny-dino", patch=8, width=32, depth=2,
                         heads=2, feat_dim=32, mlp="gelu", layerscale=True,
                         image_size=16)


def test_teacher_shapes_dense_and_global():
    x = jnp.linspace(-1, 1, 2 * 16 * 16 * 3).reshape(2, 16, 16, 3)
    m = ViTTeacher(_TINY_CLIP)
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (2, 2, 2, 16)

    gspec = TeacherSpec(**{**_TINY_DINO.__dict__, "name": "tiny-g",
                           "global_pool": True})
    mg = ViTTeacher(gspec)
    pg = mg.init(jax.random.PRNGKey(0), x)
    assert mg.apply(pg, x).shape == (2, 1, 1, 32)


def test_teacher_resizes_input():
    """Towers accept any square input and resize to their native size
    (the reference resizes in load_sample, run_training_vqvae.py:955-960)."""
    m = ViTTeacher(_TINY_CLIP)
    x = jnp.zeros((1, 32, 32, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(p, x).shape == (1, 2, 2, 16)
    # value-level: a constant image is invariant under bilinear resize, so
    # the upscaled input must reproduce the native-size output exactly —
    # catches a resize that distorts values (wrong normalization order is
    # linear and invisible here, but scale/crop bugs are not)
    c = jnp.full((1, 16, 16, 3), 0.3)
    c_big = jnp.full((1, 48, 48, 3), 0.3)
    np.testing.assert_allclose(np.asarray(m.apply(p, c_big)),
                               np.asarray(m.apply(p, c)), atol=1e-5)


def test_registry_covers_reference_feat_modalities():
    ref = ['CLIP-B16', 'CLIP-L14', 'DINOv2-B14', 'DINOv2-B14-global',
           'DINOv2-G14', 'DINOv2-G14-global', 'ImageBind-H14',
           'ImageBind-H14-global']
    assert set(ref) <= set(TEACHER_SPECS)
    assert TEACHER_SPECS["CLIP-B16"].feat_dim == 512     # modality_info: 512
    assert TEACHER_SPECS["DINOv2-B14"].feat_dim == 768   # modality_info: 768
    assert TEACHER_SPECS["ImageBind-H14"].feat_dim == 1280
    assert get_feature_extractor("rgb") is None  # non-feature -> None


# ------------------------------------------------------ torch parity
def _torch_mini_clip(width, depth, heads, patch, image_size, out_dim):
    """Minimal torch module with the OpenAI CLIP visual state-dict layout
    (conv1 / class_embedding / positional_embedding / ln_pre /
    transformer.resblocks.N.{ln_1,attn,ln_2,mlp.c_fc,mlp.c_proj} /
    ln_post / proj) and matching forward."""
    import torch
    import torch.nn as tnn

    class QuickGELU(tnn.Module):
        def forward(self, x):
            return x * torch.sigmoid(1.702 * x)

    class Resblock(tnn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = tnn.LayerNorm(width, eps=1e-5)
            self.attn = tnn.MultiheadAttention(width, heads, batch_first=True)
            self.ln_2 = tnn.LayerNorm(width, eps=1e-5)
            self.mlp = tnn.Sequential()
            self.mlp.c_fc = tnn.Linear(width, width * 4)
            self.mlp.gelu = QuickGELU()
            self.mlp.c_proj = tnn.Linear(width * 4, width)

        def forward(self, x):
            h = self.ln_1(x)
            x = x + self.attn(h, h, h, need_weights=False)[0]
            return x + self.mlp.c_proj(self.mlp.gelu(self.mlp.c_fc(
                self.ln_2(x))))

    class Visual(tnn.Module):
        def __init__(self):
            super().__init__()
            n = (image_size // patch) ** 2
            self.conv1 = tnn.Conv2d(3, width, patch, patch, bias=False)
            self.class_embedding = tnn.Parameter(torch.randn(width) * 0.02)
            self.positional_embedding = tnn.Parameter(
                torch.randn(1 + n, width) * 0.02)
            self.ln_pre = tnn.LayerNorm(width, eps=1e-5)
            self.transformer = tnn.Module()
            self.transformer.resblocks = tnn.ModuleList(
                [Resblock() for _ in range(depth)])
            self.ln_post = tnn.LayerNorm(width, eps=1e-5)
            self.proj = tnn.Parameter(torch.randn(width, out_dim) * 0.02)

        def forward(self, x):  # x: (B, 3, H, W) already teacher-normalized
            x = self.conv1(x).flatten(2).transpose(1, 2)
            cls = self.class_embedding[None, None].expand(x.shape[0], 1, -1)
            x = torch.cat([cls, x], dim=1) + self.positional_embedding
            x = self.ln_pre(x)
            for blk in self.transformer.resblocks:
                x = blk(x)
            return self.ln_post(x)[:, 1:] @ self.proj

    return Visual()


def _torch_mini_dino(width, depth, heads, patch, image_size):
    """Minimal torch module with the DINOv2 hub state-dict layout
    (patch_embed.proj / cls_token / pos_embed /
    blocks.N.{norm1,attn.qkv,attn.proj,ls1.gamma,norm2,mlp.fc1,mlp.fc2,
    ls2.gamma} / norm) and matching forward."""
    import torch
    import torch.nn as tnn

    class LayerScale(tnn.Module):
        def __init__(self):
            super().__init__()
            self.gamma = tnn.Parameter(torch.full((width,), 1e-5))

        def forward(self, x):
            return x * self.gamma

    class Attn(tnn.Module):
        def __init__(self):
            super().__init__()
            self.qkv = tnn.Linear(width, width * 3)
            self.proj = tnn.Linear(width, width)

        def forward(self, x):
            B, N, C = x.shape
            hd = C // heads
            q, k, v = self.qkv(x).reshape(B, N, 3, heads, hd).permute(
                2, 0, 3, 1, 4)
            a = (q @ k.transpose(-2, -1) / hd ** 0.5).softmax(-1)
            return self.proj((a @ v).transpose(1, 2).reshape(B, N, C))

    class PlainMlp(tnn.Module):
        def __init__(self):
            super().__init__()
            self.fc1 = tnn.Linear(width, width * 4)
            self.fc2 = tnn.Linear(width * 4, width)

        def forward(self, x):
            import torch.nn.functional as F
            return self.fc2(F.gelu(self.fc1(x)))

    class Block(tnn.Module):
        def __init__(self):
            super().__init__()
            self.norm1 = tnn.LayerNorm(width, eps=1e-6)
            self.attn = Attn()
            self.ls1 = LayerScale()
            self.norm2 = tnn.LayerNorm(width, eps=1e-6)
            self.mlp = PlainMlp()
            self.ls2 = LayerScale()

        def forward(self, x):
            x = x + self.ls1(self.attn(self.norm1(x)))
            return x + self.ls2(self.mlp(self.norm2(x)))

    class Dino(tnn.Module):
        def __init__(self):
            super().__init__()
            n = (image_size // patch) ** 2
            self.patch_embed = tnn.Module()
            self.patch_embed.proj = tnn.Conv2d(3, width, patch, patch)
            self.cls_token = tnn.Parameter(torch.randn(1, 1, width) * 0.02)
            self.pos_embed = tnn.Parameter(torch.randn(1, 1 + n, width) * 0.02)
            self.blocks = tnn.ModuleList([Block() for _ in range(depth)])
            self.norm = tnn.LayerNorm(width, eps=1e-6)

        def forward(self, x):
            import torch
            x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
            cls = self.cls_token.expand(x.shape[0], -1, -1)
            x = torch.cat([cls, x], dim=1) + self.pos_embed
            for blk in self.blocks:
                x = blk(x)
            return self.norm(x)[:, 1:]

    return Dino()


@pytest.mark.slow
def test_clip_converter_parity(tmp_path, monkeypatch):
    import torch

    from egom2p_tpu.compat.torch_convert import load_teacher_pth

    spec = _TINY_CLIP
    tm = _torch_mini_clip(spec.width, spec.depth, spec.heads, spec.patch,
                          spec.image_size, spec.feat_dim).eval()
    path = str(tmp_path / "clip.pth")
    # full-model layout: visual.-prefixed keys like the OpenAI checkpoint
    torch.save({"state_dict": {f"visual.{k}": v
                               for k, v in tm.state_dict().items()}}, path)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, spec.image_size, spec.image_size, 3)).astype(
        np.float32)
    norm = ((x * 0.5 + 0.5) - np.asarray(spec.mean, np.float32)) \
        / np.asarray(spec.std, np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(norm).permute(0, 3, 1, 2)).numpy()
    ref = ref.reshape(2, spec.grid, spec.grid, spec.feat_dim)

    # exercise the full disk->params path against the tiny spec
    monkeypatch.setitem(TEACHER_SPECS, "CLIP-B16", spec)
    params = load_teacher_pth(path, "CLIP-B16")
    out = np.asarray(ViTTeacher(spec).apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_dino_converter_parity():
    import torch

    spec = _TINY_DINO
    tm = _torch_mini_dino(spec.width, spec.depth, spec.heads, spec.patch,
                          spec.image_size).eval()
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, spec.image_size, spec.image_size, 3)).astype(
        np.float32)
    norm = ((x * 0.5 + 0.5) - np.asarray(spec.mean, np.float32)) \
        / np.asarray(spec.std, np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(norm).permute(0, 3, 1, 2)).numpy()
    ref = ref.reshape(2, spec.grid, spec.grid, spec.feat_dim)

    tiny_params = _convert_with_spec(tm.state_dict(), spec, "DINOv2-B14")
    out = np.asarray(ViTTeacher(spec).apply(tiny_params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def _convert_with_spec(sd, spec, domain):
    """Run the state-dict converter against an arbitrary (tiny) spec."""
    from egom2p_tpu.compat.torch_convert import convert_teacher_state_dict

    module = ViTTeacher(spec)
    x0 = jnp.zeros((1, spec.image_size, spec.image_size, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: module.init(k, x0),
                            jax.random.PRNGKey(0))
    sd = {k: v for k, v in sd.items()}
    params = convert_teacher_state_dict(sd, shapes["params"], domain)
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}


def test_posemb_interpolation():
    """Hub checkpoints carry pos_embed at the pretrain grid (DINOv2: 518px
    -> 1+37^2 positions); the converter must interpolate to the spec grid."""
    from egom2p_tpu.compat.torch_convert import _interp_posemb

    rng = np.random.default_rng(0)
    arr = rng.normal(size=(1, 1 + 37 * 37, 8)).astype(np.float32)
    out = _interp_posemb(arr, 1 + 16 * 16)
    assert out.shape == (1, 257, 8)
    np.testing.assert_allclose(out[:, 0], arr[:, 0])  # cls slot untouched
    # a constant grid must stay constant under resampling
    const = np.concatenate(
        [arr[:, :1], np.full((1, 37 * 37, 8), 3.0, np.float32)], axis=1)
    np.testing.assert_allclose(_interp_posemb(const, 1 + 16 * 16)[0, 1:],
                               3.0, rtol=1e-5)


@pytest.mark.slow
def test_dino_converter_interpolates_pretrain_posemb(monkeypatch):
    """End-to-end: a torch checkpoint whose pos_embed grid is larger than
    the spec's loads via interpolation instead of a shape error."""
    import torch

    from egom2p_tpu.compat.torch_convert import convert_teacher_state_dict

    spec = _TINY_DINO  # image 16 / patch 8 -> grid 2 (1+4 positions)
    tm = _torch_mini_dino(spec.width, spec.depth, spec.heads, spec.patch,
                          32).eval()  # pretrain grid 4 (1+16 positions)
    sd = {k: v for k, v in tm.state_dict().items()}
    assert sd["pos_embed"].shape[1] == 17
    params = _convert_with_spec(sd, spec, "DINOv2-B14")
    assert params["params"]["pos_embed"].shape == (1, 5, spec.width)
    x = jnp.zeros((1, 16, 16, 3))
    out = ViTTeacher(spec).apply(params, x)
    assert np.isfinite(np.asarray(out)).all()


# ------------------------------------------------------ feature VQ-VAE
def test_feature_vqvae_roundtrip():
    from egom2p_tpu.tokenizers.feature_vqvae import feature_vqvae_from_config

    TEACHER_SPECS_BACKUP = dict(TEACHER_SPECS)
    TEACHER_SPECS["TEST-T8"] = TeacherSpec(
        name="TEST-T8", patch=8, width=32, depth=1, heads=2, feat_dim=16,
        proj=True, ln_pre=True, patch_bias=False, image_size=16)
    try:
        tok = feature_vqvae_from_config("TEST-T8", jax.random.PRNGKey(0),
                                        codebook_size=32, latent_dim=8,
                                        dim=32, depth=1, num_heads=2)
        feats = jnp.asarray(np.random.default_rng(0).normal(
            size=(2, 2, 2, 16)).astype(np.float32))
        tokens = tok.tokenize(feats)
        assert tokens.shape == (2, 2, 2)
        assert int(tokens.max()) < 32
        rec = tok.decode_tokens(tokens)
        assert rec.shape == feats.shape
        assert np.isfinite(np.asarray(tok.autoencode(feats))).all()
    finally:
        TEACHER_SPECS.clear()
        TEACHER_SPECS.update(TEACHER_SPECS_BACKUP)


@pytest.mark.slow
def test_feature_domain_trainer_end_to_end(tmp_path, monkeypatch):
    """Tiny registered teacher domain through the real trainer: train one
    epoch with eval + EMA, then tokenize-mode on the checkpoint."""
    import run_training_vqvae as T

    monkeypatch.setitem(TEACHER_SPECS, "TEST-T8", TeacherSpec(
        name="TEST-T8", patch=8, width=32, depth=1, heads=2, feat_dim=16,
        proj=True, ln_pre=True, patch_bias=False, image_size=16))

    imgs = np.random.default_rng(0).integers(
        0, 255, (8, 16, 16, 3), dtype=np.uint8)
    data_path = str(tmp_path / "imgs.npy")
    np.save(data_path, imgs)
    out_dir = str(tmp_path / "out")

    argv = ["--domain", "TEST-T8", "--data_path", data_path,
            "--epochs", "1", "--batch_size", "4", "--vq_dim", "32",
            "--vq_depth", "1", "--vq_heads", "2", "--latent_dim", "8",
            "--codebook_size", "32", "--eval_freq", "1", "--model_ema",
            "true", "--teacher_dtype", "fp32", "--output_dir", out_dir,
            "--num_eval_metrics_samples", "8"]
    args = T.get_args(argv)
    T.run_train(args)

    import json
    import os
    log = [json.loads(l) for l in open(os.path.join(out_dir, "log.txt"))]
    assert any("eval_mse" in e for e in log), log
    assert any("ema_mse" in e for e in log), log  # EMA suite ran too

    # tokenize mode on the trained checkpoint
    from egom2p_tpu.core.checkpoint import latest_checkpoint
    ckpt = latest_checkpoint(out_dir)
    argv_tok = argv + ["--tokenize", "--tokenize_path", data_path,
                       "--resume", ckpt,
                       "--tokenize_save_path", str(tmp_path)]
    args_tok = T.get_args(argv_tok)
    out = T.run_tokenize(args_tok)
    tokens = np.load(out)["arr_0"]
    assert tokens.shape == (8, 2, 2)
    assert tokens.dtype == np.int16


@pytest.mark.slow
def test_clip_parity_vs_reference_vendored_model(monkeypatch):
    """Anchor the CLIP tower against the REFERENCE's own vendored CLIP
    visual (egom2p/utils/clip/model.py VisionTransformer) — the exact
    module whose `return_final_tokens_no_cls` output the reference's
    feature extraction consumes (run_training_vqvae.py:966-971).  Unlike
    the mini-model parity above, this cannot pass via a shared
    misreading of the CLIP graph."""
    import importlib.util

    import torch

    # load model.py directly (the clip package __init__ drags in
    # hub-download machinery this environment doesn't have)
    spec_mod = importlib.util.spec_from_file_location(
        "ref_clip_model", "/root/reference/egom2p/utils/clip/model.py")
    ref_clip = importlib.util.module_from_spec(spec_mod)
    spec_mod.loader.exec_module(ref_clip)
    VisionTransformer = ref_clip.VisionTransformer

    spec = _TINY_CLIP
    torch.manual_seed(0)
    tm = VisionTransformer(input_resolution=spec.image_size,
                           patch_size=spec.patch, width=spec.width,
                           layers=spec.depth, heads=spec.heads,
                           output_dim=spec.feat_dim).eval().float()
    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (2, spec.image_size, spec.image_size, 3)).astype(
        np.float32)
    norm = ((x * 0.5 + 0.5) - np.asarray(spec.mean, np.float32)) \
        / np.asarray(spec.std, np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(norm).permute(0, 3, 1, 2),
                 return_final_tokens_no_cls=True).numpy()
    ref = ref.reshape(2, spec.grid, spec.grid, spec.feat_dim)

    params = _convert_with_spec(dict(tm.state_dict()), spec, "CLIP-B16")
    out = np.asarray(ViTTeacher(spec).apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_dino_swiglu_converter_parity():
    """G14-style fused-SwiGLU blocks: the converter must split w12 into
    gate/value rows matching GatedMlp's fc1/fc3 and hit DINOv2's fused
    hidden size via the 2/3 rescale."""
    import torch
    import torch.nn as tnn

    width, depth, heads, patch, image = 24, 2, 2, 8, 16
    hidden = int(2 * (width * 4) / 3)  # GatedMlp rescale == SwiGLUFFNFused

    class SwiGLUFused(tnn.Module):
        def __init__(self):
            super().__init__()
            self.w12 = tnn.Linear(width, 2 * hidden)
            self.w3 = tnn.Linear(hidden, width)

        def forward(self, x):
            x12 = self.w12(x)
            x1, x2 = x12.chunk(2, dim=-1)
            return self.w3(tnn.functional.silu(x1) * x2)

    base = _torch_mini_dino(width, depth, heads, patch, image)
    for blk in base.blocks:  # swap in fused SwiGLU MLPs
        blk.mlp = SwiGLUFused()
    base = base.eval()

    spec = TeacherSpec(name="tiny-g14", patch=patch, width=width,
                       depth=depth, heads=heads, feat_dim=width,
                       mlp="swiglu", layerscale=True, image_size=image)
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, (2, image, image, 3)).astype(np.float32)
    norm = ((x * 0.5 + 0.5) - np.asarray(spec.mean, np.float32)) \
        / np.asarray(spec.std, np.float32)
    import torch as _t
    with _t.no_grad():
        ref = base(_t.from_numpy(norm).permute(0, 3, 1, 2)).numpy()
    ref = ref.reshape(2, spec.grid, spec.grid, width)

    params = _convert_with_spec(dict(base.state_dict()), spec, "DINOv2-G14")
    out = np.asarray(ViTTeacher(spec).apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.slow
def test_imagebind_converter_loads():
    """ImageBind layout: trunk prefixes, 2-frame Conv3d patch stem collapsed
    by summing the time taps (PadIm2Video duplicates the image), in_proj
    attention.  Synthesized checkpoint with the published key names; loads
    and runs finite (no reference impl in-tree to anchor numerics)."""
    import torch

    width, depth, heads, patch, image = 32, 2, 2, 8, 16
    spec = TeacherSpec(name="tiny-ib", patch=patch, width=width, depth=depth,
                       heads=heads, feat_dim=width, ln_pre=True,
                       ln_post=False, patch_bias=False, image_size=image)
    g = torch.Generator().manual_seed(0)

    def r(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    n = (image // patch) ** 2
    sd = {
        "modality_preprocessors.vision.rgbt_stem.proj.1.weight":
            r(width, 3, 2, patch, patch),
        "modality_preprocessors.vision.cls_token": r(1, 1, width),
        "modality_preprocessors.vision.pos_embedding_helper.pos_embed":
            r(1, 1 + n, width),
        "modality_trunks.vision.pre_transformer_layer.0.weight":
            torch.ones(width),
        "modality_trunks.vision.pre_transformer_layer.0.bias":
            torch.zeros(width),
    }
    for i in range(depth):
        tb = f"modality_trunks.vision.blocks.{i}."
        sd.update({
            tb + "norm_1.weight": torch.ones(width),
            tb + "norm_1.bias": torch.zeros(width),
            tb + "norm_2.weight": torch.ones(width),
            tb + "norm_2.bias": torch.zeros(width),
            tb + "attn.in_proj_weight": r(3 * width, width),
            tb + "attn.in_proj_bias": torch.zeros(3 * width),
            tb + "attn.out_proj.weight": r(width, width),
            tb + "attn.out_proj.bias": torch.zeros(width),
            tb + "mlp.fc1.weight": r(4 * width, width),
            tb + "mlp.fc1.bias": torch.zeros(4 * width),
            tb + "mlp.fc2.weight": r(width, 4 * width),
            tb + "mlp.fc2.bias": torch.zeros(width),
        })

    params = _convert_with_spec(sd, spec, "ImageBind-H14")
    # patch kernel = sum of the two time taps
    want = sd["modality_preprocessors.vision.rgbt_stem.proj.1.weight"] \
        .numpy().sum(axis=2).transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(params["params"]["patch_embed"]["kernel"]), want,
        atol=1e-6)
    x = jnp.asarray(np.random.default_rng(6).uniform(
        -1, 1, (1, image, image, 3)).astype(np.float32))
    out = np.asarray(ViTTeacher(spec).apply(params, x))
    assert out.shape == (1, 2, 2, width) and np.isfinite(out).all()

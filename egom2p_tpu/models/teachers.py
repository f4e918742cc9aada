"""Frozen ViT feature-teacher towers for feature-map VQ tokenizer training.

The reference trains VQ tokenizers on dense teacher features: a frozen
CLIP / DINOv2 / ImageBind vision transformer embeds RGB images and the
VQ-VAE learns to compress the patch-token grid
(reference: run_training_vqvae.py:460-481 `get_feature_extractor`,
:949-1002 `load_sample` reshaping tokens to (B, d, nh, nw) feature maps,
FEAT_MODALITIES at :78).  The reference loads the torch towers from
OpenAI / torch.hub / ImageBind downloads; here they are flax modules
built from the same transformer primitives as the rest of the repo
(hd-64 attention for CLIP-B16 / DINOv2-B14), run frozen inside jit on
the TPU, with weight converters in `compat/torch_convert.py` for the
published torch checkpoints.

Architectural fidelity notes (what each spec mirrors):

  * CLIP visual (reference egom2p/utils/clip/model.py:228-285,
    `return_final_tokens_no_cls`): patchify conv (no bias), class
    embedding, learned posemb, ln_pre, pre-LN blocks with QuickGELU
    MLPs, ln_post over ALL tokens, then the `proj` matrix; the emitted
    feature map is the projected patch tokens (cls dropped).
  * DINOv2 (torch.hub dinov2_vitb14/vitg14): patchify conv (bias), cls
    token, learned posemb, no ln_pre, blocks with LayerScale
    (init 1e-5), MLP for B14 / fused SwiGLU for G14, final norm;
    `-global` domains emit `x_norm_clstoken` as a 1x1 map, dense
    domains `x_norm_patchtokens` (run_training_vqvae.py:977-988).
  * ImageBind-H14: the ViT-H/14 vision trunk (width 1280) with pre-LN;
    the reference indexes cls/patch tokens straight off the trunk
    output (run_training_vqvae.py:989-1002, num_channels 1280 =
    trunk width, i.e. before the 1024-dim joint-embedding head), so no
    final norm or projection is applied here either.

Inputs are channels-last (B, H, W, 3) in [-1, 1] (the repo's video
pipeline convention); each spec renormalizes to its teacher's
pretraining statistics internally.  Static `image_size` shapes only
(TPU/XLA-first: no posemb interpolation at trace time).

CLIP-L14 and DINOv2-G14 are listed in the reference's FEAT_MODALITIES
but have no MODALITY_INFO entries upstream (their `n_channels` lookup
would KeyError, run_training_vqvae.py:401); here they are fully
specified and trainable.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from egom2p_tpu.models.transformer import Attention, GatedMlp, LayerNorm, Mlp

# Pretraining normalization statistics (image in [0, 1]).
_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


@dataclasses.dataclass(frozen=True)
class TeacherSpec:
    name: str
    patch: int
    width: int
    depth: int
    heads: int
    feat_dim: int          # channels of the emitted feature map
    mlp: str = "gelu"      # "quick_gelu" | "gelu" | "swiglu"
    ln_pre: bool = False
    ln_post: bool = True
    layerscale: bool = False
    patch_bias: bool = True
    proj: bool = False     # CLIP: project tokens by the `proj` matrix
    global_pool: bool = False  # emit the cls token as a (1, 1) map
    image_size: int = 224
    ln_eps: float = 1e-6
    mean: Tuple[float, float, float] = _IMAGENET_MEAN
    std: Tuple[float, float, float] = _IMAGENET_STD

    @property
    def grid(self) -> int:
        return self.image_size // self.patch


def _clip(name, patch, width, depth, heads, feat_dim):
    return TeacherSpec(name=name, patch=patch, width=width, depth=depth,
                       heads=heads, feat_dim=feat_dim, mlp="quick_gelu",
                       ln_pre=True, patch_bias=False, proj=True,
                       ln_eps=1e-5, mean=_CLIP_MEAN, std=_CLIP_STD)


def _dino(name, width, depth, heads, mlp, global_pool):
    return TeacherSpec(name=name, patch=14, width=width, depth=depth,
                       heads=heads, feat_dim=width, mlp=mlp,
                       layerscale=True, global_pool=global_pool)


def _imagebind(name, global_pool):
    return TeacherSpec(name=name, patch=14, width=1280, depth=32, heads=16,
                       feat_dim=1280, ln_pre=True, ln_post=False,
                       patch_bias=False, global_pool=global_pool,
                       mean=_CLIP_MEAN, std=_CLIP_STD)


# Registry keyed by the reference's --domain names (FEAT_MODALITIES,
# run_training_vqvae.py:78).
TEACHER_SPECS = {
    "CLIP-B16": _clip("CLIP-B16", 16, 768, 12, 12, 512),
    "CLIP-L14": _clip("CLIP-L14", 14, 1024, 24, 16, 768),
    "DINOv2-B14": _dino("DINOv2-B14", 768, 12, 12, "gelu", False),
    "DINOv2-B14-global": _dino("DINOv2-B14-global", 768, 12, 12, "gelu",
                               True),
    "DINOv2-G14": _dino("DINOv2-G14", 1536, 40, 24, "swiglu", False),
    "DINOv2-G14-global": _dino("DINOv2-G14-global", 1536, 40, 24, "swiglu",
                               True),
    "ImageBind-H14": _imagebind("ImageBind-H14", False),
    "ImageBind-H14-global": _imagebind("ImageBind-H14-global", True),
}

FEAT_DOMAINS = tuple(TEACHER_SPECS)


class _TeacherBlock(nn.Module):
    """Pre-LN ViT block with optional LayerScale (DINOv2) and a
    QuickGELU / GELU / fused-SwiGLU MLP."""
    num_heads: int
    mlp: str
    layerscale: bool
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]

        def scale(h, name):
            if not self.layerscale:
                return h
            g = self.param(name, nn.initializers.constant(1e-5), (dim,))
            return h * g.astype(h.dtype)

        h = Attention(self.num_heads, name="attn")(
            LayerNorm(eps=self.ln_eps, name="norm1")(x))
        x = x + scale(h, "ls1")
        y = LayerNorm(eps=self.ln_eps, name="norm2")(x)
        if self.mlp == "swiglu":
            # GatedMlp's 2/3 rescale reproduces DINOv2's SwiGLUFFNFused
            # hidden size (1536 * 4 * 2/3 = 4096 for G14)
            h = GatedMlp(dim * 4, act=nn.silu, name="mlp")(y)
        else:
            act = _quick_gelu if self.mlp == "quick_gelu" else nn.gelu
            h = Mlp(dim * 4, act=act, name="mlp")(y)
        return x + scale(h, "ls2")


class ViTTeacher(nn.Module):
    """Frozen feature tower: (B, H, W, 3) in [-1, 1] -> feature map
    (B, grid, grid, feat_dim), or (B, 1, 1, feat_dim) for -global."""
    spec: TeacherSpec

    @nn.compact
    def __call__(self, x):
        s = self.spec
        if x.shape[1] != s.image_size:
            x = jax.image.resize(
                x, (x.shape[0], s.image_size, s.image_size, x.shape[-1]),
                method="bilinear")
        mean = jnp.asarray(s.mean, x.dtype)
        std = jnp.asarray(s.std, x.dtype)
        x = (x * 0.5 + 0.5 - mean) / std  # [-1,1] -> teacher stats

        x = nn.Conv(s.width, (s.patch, s.patch),
                    strides=(s.patch, s.patch), padding="VALID",
                    use_bias=s.patch_bias, name="patch_embed")(x)
        B, nh, nw, _ = x.shape
        x = x.reshape(B, nh * nw, s.width)
        cls = self.param("cls_token",
                         nn.initializers.normal(s.width ** -0.5),
                         (1, 1, s.width))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (B, 1, s.width)), x], 1)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 1 + nh * nw, s.width))
        x = x + pos.astype(x.dtype)
        if s.ln_pre:
            x = LayerNorm(eps=s.ln_eps, name="ln_pre")(x)
        for i in range(s.depth):
            x = _TeacherBlock(num_heads=s.heads, mlp=s.mlp,
                              layerscale=s.layerscale, ln_eps=s.ln_eps,
                              name=f"blocks_{i}")(x)
        if s.ln_post:
            x = LayerNorm(eps=s.ln_eps, name="ln_post")(x)
        if s.proj:
            proj = self.param("proj",
                              nn.initializers.normal(s.width ** -0.5),
                              (s.width, s.feat_dim))
            x = x @ proj.astype(x.dtype)
        if s.global_pool:
            return x[:, 0].reshape(B, 1, 1, s.feat_dim)
        return x[:, 1:].reshape(B, nh, nw, s.feat_dim)


def get_feature_extractor(domain: str, ckpt_path: Optional[str] = None,
                          rng: Optional[jax.Array] = None):
    """Build the frozen teacher for a feature domain.

    Mirrors reference run_training_vqvae.py:460-481, except weights come
    from a local torch checkpoint (`--teacher_ckpt`) instead of hub
    downloads; with no checkpoint the tower is randomly initialized
    (enough for architecture/throughput smoke runs -- the reference
    crashes outright without network access).

    Returns (module, params, spec); returns None for non-feature domains
    like the reference helper.
    """
    if domain not in TEACHER_SPECS:
        return None
    spec = TEACHER_SPECS[domain]
    module = ViTTeacher(spec)
    if ckpt_path:
        from egom2p_tpu.compat.torch_convert import load_teacher_pth
        params = load_teacher_pth(ckpt_path, domain)
    else:
        x0 = jnp.zeros((1, spec.image_size, spec.image_size, 3), jnp.float32)
        params = module.init(rng if rng is not None else jax.random.PRNGKey(0),
                             x0)
    return module, params, spec

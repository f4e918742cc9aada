"""Torch -> JAX checkpoint converters.

Maps the reference PyTorch state dicts onto this framework's flax param trees
so released checkpoints interoperate (north star in BASELINE.json):

  * EgoM2P main model (reference: egom2p/models/egom2p_model.py state_dict,
    saved by egom2p/utils/checkpoint.py:91-120 as {'model': sd, 'args': ...}),
  * cam/gaze VQ-VAE tokenizers (reference: egom2p/vq/vqvae.py),
  * Cosmos DV video tokenizer (TorchScript encoder.jit/decoder.jit state
    dicts, reference: cosmos_tokenizer/utils.py:96-126).

The conversion walks the *flax* tree and derives each torch key, so a missing
mapping fails loudly instead of silently keeping random weights.
"""
from __future__ import annotations

import re
from typing import Dict, Tuple

import numpy as np


# --------------------------------------------------------------- primitives
def _t(x) -> np.ndarray:
    """torch tensor -> numpy (fp32)."""
    arr = x.detach().cpu().numpy() if hasattr(x, "detach") else np.asarray(x)
    return np.ascontiguousarray(arr)


def _dense(sd, key):
    return _t(sd[key]).T  # torch Linear (out,in) -> flax (in,out)


def _conv3d(sd, key):
    return _t(sd[key]).transpose(2, 3, 4, 1, 0)  # OIdhw -> dhwIO


def _conv1d(sd, key):
    return _t(sd[key]).transpose(2, 1, 0)  # OIk -> kIO


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def _check(name, expected_shape, got: np.ndarray):
    if tuple(expected_shape) != tuple(got.shape):
        raise ValueError(f"{name}: shape mismatch, flax {tuple(expected_shape)} "
                         f"vs converted torch {tuple(got.shape)}")
    return got


# ----------------------------------------------------------------- EgoM2P
def convert_egom2p_state_dict(sd: Dict, flax_params: Dict,
                              in_domains, out_domains) -> Dict:
    """Reference EgoM2P state_dict -> flax params with the same tree."""
    enc_set = set(in_domains)
    flat = _flatten(flax_params["params"])
    out = {}
    for path, leaf in flat.items():
        name = "/".join(path)
        p0 = path[0]

        def dense_or_bias(tkey_base):
            if path[-1] == "kernel":
                return _dense(sd, tkey_base + ".weight")
            return _t(sd[tkey_base + ".bias"])

        if p0.startswith("mod_emb_"):
            mod = p0[len("mod_emb_"):]
            tkey = (f"encoder_embeddings.{mod}.mod_emb" if mod in enc_set
                    else f"decoder_embeddings.{mod}.mod_emb")
            val = _t(sd[tkey])
        elif p0.startswith("dec_mod_emb_"):
            mod = p0[len("dec_mod_emb_"):]
            val = _t(sd[f"decoder_embeddings.{mod}.mod_emb"])
        elif p0 == "mask_token":
            val = _t(sd["mask_token"])
        elif p0 == "register_tokens":
            val = _t(sd["register_tokens"])
        elif p0.startswith("encoder_embeddings_"):
            mod = p0[len("encoder_embeddings_"):]
            if path[1] == "token_emb":
                val = _t(sd[f"encoder_embeddings.{mod}.token_emb.weight"])
            elif path[1] == "proj":
                # raw-pixel patch projection (ImageEncoderEmbedding.proj,
                # reference: encoder_embeddings.py:455-456); bias-free Linear
                val = _dense(sd, f"encoder_embeddings.{mod}.proj.weight")
            elif path[1].startswith("emb_proj"):
                # SequenceEmbEncoderEmbedding.emb_proj: plain Linear, or a
                # 2-layer bottleneck Sequential (reference: :563-570)
                base = (f"encoder_embeddings.{mod}.emb_proj"
                        if path[1] == "emb_proj"
                        else f"encoder_embeddings.{mod}.emb_proj.{path[1][-1]}")
                val = (_dense(sd, base + ".weight") if path[-1] == "kernel"
                       else _t(sd[base + ".bias"]))
            else:
                raise KeyError(name)
        elif p0.startswith("decoder_embeddings_"):
            mod = p0[len("decoder_embeddings_"):]
            if path[1] == "token_emb":
                val = _t(sd[f"decoder_embeddings.{mod}.token_emb.weight"])
            elif path[1] == "to_logits":
                val = _t(sd[f"decoder_embeddings.{mod}.to_logits.weight"])
            else:
                raise KeyError(name)
        elif p0 in ("encoder_norm", "decoder_norm"):
            val = _t(sd[f"{p0}.{path[-1]}"])
        elif p0 == "decoder_proj_context":
            val = dense_or_bias("decoder_proj_context")
        elif re.fullmatch(r"(encoder|decoder)_\d+", p0):
            stack, idx = p0.rsplit("_", 1)
            base = f"{stack}.{idx}." + ".".join(path[1:-1])
            if path[-1] in ("kernel",):
                val = _dense(sd, base + ".weight")
            elif path[-2] in ("norm1", "norm2", "query_norm", "context_norm",
                              "q_norm", "k_norm"):
                val = _t(sd[base + f".{path[-1]}"])
            else:  # bias of a Dense
                val = _t(sd[base + ".bias"])
        else:
            raise KeyError(f"no torch mapping for flax param {name}")
        out[path] = _check(name, leaf.shape, val).astype(np.float32)
    return {"params": _unflatten(out)}


_PTH_CACHE: Dict = {}


def _load_pth_cached(path: str):
    """One torch.load per file: eval scripts read the embedded args and then
    the weights from the same multi-GB .pth — deserializing twice doubles
    load time and peak host memory."""
    import os

    import torch
    key = (os.path.abspath(path), os.path.getmtime(path))
    if key not in _PTH_CACHE:
        _PTH_CACHE.clear()
        _PTH_CACHE[key] = torch.load(path, map_location="cpu",
                                     weights_only=False)
    return _PTH_CACHE[key]


def read_pth_args(path: str):
    """The reference pickles the full argparse namespace inside .pth
    checkpoints (reference: checkpoint.py:100-105); eval scripts rebuild the
    model from it (eval_model_rgb2cam.py:33-35)."""
    return _load_pth_cached(path).get("args")


def shape_mod_dict(domains, info, batch: int = 1) -> Dict:
    """Shape-only mod-dict for model.init / jax.eval_shape: one entry per
    domain at its max_tokens length, with the four required mask keys."""
    import jax.numpy as jnp

    md = {}
    for m in dict.fromkeys(domains):
        L = info[m]["max_tokens"]
        md[m] = {"tensor": jnp.zeros((batch, L), jnp.int32),
                 "input_mask": jnp.ones((batch, L), bool),
                 "target_mask": jnp.zeros((batch, L), bool),
                 "decoder_attention_mask": jnp.zeros((batch, L), jnp.int32)}
    return md


def load_egom2p_pth(path: str, model) -> Dict:
    import jax
    import jax.numpy as jnp

    ckpt = _load_pth_cached(path)
    sd = ckpt.get("model", ckpt)
    # shape-only flax tree over the union of in/out domains: an output-only
    # modality still owns decoder embeddings, which must appear in the
    # shape tree to be converted
    from egom2p_tpu.data.modality_info import MODALITY_INFO
    md = shape_mod_dict(tuple(model.in_domains) + tuple(model.out_domains),
                        model.mod_info if model.modality_info
                        else MODALITY_INFO)
    shapes = jax.eval_shape(lambda k: model.init(k, md, 64, 64),
                            jax.random.PRNGKey(0))
    converted = convert_egom2p_state_dict(sd, shapes, model.in_domains,
                                          model.out_domains)
    return jax.tree_util.tree_map(jnp.asarray, converted)


# -------------------------------------------------------------- seq VQ-VAE
def convert_seq_vqvae_state_dict(sd: Dict, flax_params: Dict) -> Tuple[Dict, Dict]:
    """Reference cam/gaze VQVAE state_dict -> (flax params, vq_state dict)."""
    flat = _flatten(flax_params["params"])
    out = {}
    for path, leaf in flat.items():
        name = "/".join(path)
        p0 = path[0]
        if p0 in ("encoder", "decoder"):
            rest = path[1:]
            if rest[0] == "conv":
                val = (_conv1d(sd, f"{p0}.conv.weight") if rest[-1] == "kernel"
                       else _t(sd[f"{p0}.conv.bias"]))
            elif rest[0] == "out_proj":
                val = (_dense(sd, f"{p0}.out_proj.weight") if rest[-1] == "kernel"
                       else _t(sd[f"{p0}.out_proj.bias"]))
            elif rest[0].startswith("blocks_"):
                i = rest[0].split("_")[1]
                base = f"{p0}.blocks.{i}." + ".".join(rest[1:-1])
                if rest[-1] == "kernel":
                    val = _dense(sd, base + ".weight")
                elif rest[-2] in ("norm1", "norm2"):
                    val = _t(sd[base + f".{rest[-1]}"])
                else:
                    val = _t(sd[base + ".bias"])
            elif rest[0] in ("norm_mlp",):
                val = _t(sd[f"{p0}.norm_mlp.{rest[-1]}"])
            elif rest[0] == "post_mlp":
                base = f"{p0}.post_mlp." + ".".join(rest[1:-1])
                val = (_dense(sd, base + ".weight") if rest[-1] == "kernel"
                       else _t(sd[base + ".bias"]))
            else:
                raise KeyError(name)
        elif p0 in ("quant_proj", "post_quant_proj"):
            if path[-1] == "kernel":
                val = _t(sd[f"{p0}.weight"])[:, :, 0].T  # Conv1d 1x1 -> Dense
            else:
                val = _t(sd[f"{p0}.bias"])
        else:
            raise KeyError(name)
        out[path] = _check(name, leaf.shape, val).astype(np.float32)

    vq_state = {
        "embed": _t(sd["quantize._codebook.embed"]).astype(np.float32),
        "cluster_size": _t(sd["quantize._codebook.cluster_size"]).astype(np.float32),
        "initted": np.asarray(bool(_t(sd["quantize._codebook.initted"]).item())),
    }
    return {"params": _unflatten(out)}, vq_state


def load_seq_vqvae_pth(path: str, domain: str):
    import jax
    import jax.numpy as jnp
    import torch

    from egom2p_tpu.ops.vq import VQState
    from egom2p_tpu.tokenizers.seq_vqvae import seq_vqvae_from_config

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    tok = seq_vqvae_from_config(domain, jax.random.PRNGKey(0))
    params, vq = convert_seq_vqvae_state_dict(sd, tok.params)
    tok.params = jax.tree_util.tree_map(jnp.asarray, params)
    tok.vq_state = VQState(embed=jnp.asarray(vq["embed"]),
                           cluster_size=jnp.asarray(vq["cluster_size"]),
                           initted=jnp.asarray(vq["initted"]))
    return tok


# ----------------------------------------------------------------- Cosmos
_COSMOS_ATTN_SUFFIX = {"_s": "0", "_t": "1"}


def _cosmos_torch_key(path: Tuple[str, ...]) -> str:
    """flax path inside encoder/decoder -> reference torch key suffix."""
    parts = list(path)
    out = []
    for p in parts:
        m = re.fullmatch(r"(down|up)_(\d+)_(block|attn)_(\d+)(_[st])?", p)
        if m:
            lvl, idx = m.group(2), m.group(4)
            out.append(f"{m.group(1)}.{lvl}.{m.group(3)}.{idx}")
            if m.group(5):
                out.append(_COSMOS_ATTN_SUFFIX[m.group(5)])
            continue
        m = re.fullmatch(r"(down|up)_(\d+)_(downsample|upsample)", p)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}.{m.group(3)}")
            continue
        m = re.fullmatch(r"mid_attn_1(_[st])?", p)
        if m:
            out.append("mid.attn_1")
            if m.group(1):  # factorized: spatial/temporal Sequential slot
                out.append(_COSMOS_ATTN_SUFFIX[m.group(1)])
            continue
        m = re.fullmatch(r"mid_(block_\d+)", p)
        if m:
            out.append(f"mid.{m.group(1)}")
            continue
        m = re.fullmatch(r"(conv_in|conv_out|conv1|conv2)_(\d)", p)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}")
            continue
        out.append(p)
    return ".".join(out)


def convert_cosmos_state_dict(sd: Dict, flax_params: Dict) -> Dict:
    """Cosmos DV torch state_dict (full or merged encoder/decoder JIT dicts)
    -> flax params tree."""
    flat = _flatten(flax_params["params"])
    out = {}
    for path, leaf in flat.items():
        name = "/".join(path)
        tbase = _cosmos_torch_key(path[:-1])
        leafname = path[-1]
        if leafname == "kernel":  # conv3d
            assert path[-2] == "conv3d", name
            val = _conv3d(sd, tbase + ".weight")
        elif leafname == "scale":  # CausalNormalize
            val = _t(sd[tbase + ".norm.weight"])
        elif leafname == "bias" and path[-2] == "conv3d":
            val = _t(sd[tbase + ".bias"])
        elif leafname == "bias":  # normalize bias
            val = _t(sd[tbase + ".norm.bias"])
        else:
            raise KeyError(name)
        out[path] = _check(name, leaf.shape, val).astype(np.float32)
    return {"params": _unflatten(out)}


def load_cosmos_dv_pth(encoder_path: str, decoder_path: str = None, cfg=None):
    """Load Cosmos DV weights from TorchScript encoder.jit / decoder.jit (or a
    plain .pth with the full network state_dict)."""
    import jax
    import jax.numpy as jnp
    import torch

    from egom2p_tpu.tokenizers.cosmos import (CausalVideoTokenizer,
                                              DV4x8x8_CONFIG)
    from egom2p_tpu.tokenizers.cosmos.network import CausalDiscreteVideoTokenizer

    cfg = cfg or DV4x8x8_CONFIG

    def read_sd(p):
        if p.endswith(".jit"):
            return torch.jit.load(p, map_location="cpu").state_dict()
        ckpt = torch.load(p, map_location="cpu", weights_only=False)
        return ckpt.get("model", ckpt)

    sd = dict(read_sd(encoder_path))
    if decoder_path:
        sd.update(read_sd(decoder_path))
    # JIT wrappers rename nothing else: encoder.* / decoder.* / quant_conv.* /
    # post_quant_conv.* (+ inv_quant.quantizer buffers which we recompute)
    sd = {k: v for k, v in sd.items() if not k.startswith("inv_quant")
          and not k.startswith("quantizer")}

    module = CausalDiscreteVideoTokenizer(cfg)
    x0 = jnp.zeros((1, 17, 256, 256, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: module.init(k, x0), jax.random.PRNGKey(0))
    params = convert_cosmos_state_dict(sd, shapes)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return CausalVideoTokenizer(params, cfg)


def load_divae_encoder_warm_start(safetensors_path: str, params: Dict,
                                  verbose: bool = True) -> Dict:
    """Warm-start a video VQ-VAE encoder from 4M DiVAE rgb-tokenizer weights
    (reference: egom2p/vq/vqvae.py:501-554, --init_weights):

      * the conv2d patch projection initializes the CENTRAL temporal frame of
        the conv3d tubelet projection (other frames keep their init),
      * transformer blocks copy norm1/attn.qkv/attn.proj/norm2/mlp.fc1/fc2,
      * quant_proj takes the 1x1 conv2d kernel.

    Keys absent from this tree (the reference's norm_mlp/post_mlp of the 2D
    encoder) are skipped with a report — the reference's copy is equally
    partial.  Requires the DiVAE safetensors file locally (zero-egress env)."""
    import jax.numpy as jnp
    from safetensors.numpy import load_file

    sd = load_file(safetensors_path)
    p = params["params"]
    enc = p["encoder"]
    copied, skipped = [], []

    def put(dst, key, value):
        tgt = dst[key]
        assert tgt.shape == value.shape, (key, tgt.shape, value.shape)
        dst[key] = jnp.asarray(np.asarray(value, dtype=np.float32))
        copied.append(key)

    # central-frame conv3d init (reference: vqvae.py:512-517)
    if "encoder.proj.weight" in sd and "patch_embed" in enc:
        w2d = sd["encoder.proj.weight"]            # (D, C, p, p)
        k = np.array(enc["patch_embed"]["kernel"])  # (t, p, p, C, D)
        t_mid = k.shape[0] // 2
        # central frame only; other temporal frames keep their random init
        # (reference: vqvae.py:513-515 copies just [:, :, t])
        k[t_mid] = w2d.transpose(2, 3, 1, 0)
        enc["patch_embed"]["kernel"] = jnp.asarray(k)
        copied.append("patch_embed.kernel")
        if "encoder.proj.bias" in sd and "bias" in enc["patch_embed"]:
            put(enc["patch_embed"], "bias", sd["encoder.proj.bias"])

    n_blocks = len([k for k in enc if k.startswith("blocks_")])
    for i in range(n_blocks):
        blk = enc.get(f"blocks_{i}")
        base = f"encoder.blocks.{i}"
        pairs = [
            (("norm1", "scale"), f"{base}.norm1.weight", None),
            (("norm1", "bias"), f"{base}.norm1.bias", None),
            (("attn", "qkv", "kernel"), f"{base}.attn.qkv.weight", "T"),
            (("attn", "qkv", "bias"), f"{base}.attn.qkv.bias", None),
            (("attn", "proj", "kernel"), f"{base}.attn.proj.weight", "T"),
            (("attn", "proj", "bias"), f"{base}.attn.proj.bias", None),
            (("norm2", "scale"), f"{base}.norm2.weight", None),
            (("norm2", "bias"), f"{base}.norm2.bias", None),
            (("mlp", "fc1", "kernel"), f"{base}.mlp.fc1.weight", "T"),
            (("mlp", "fc1", "bias"), f"{base}.mlp.fc1.bias", None),
            (("mlp", "fc2", "kernel"), f"{base}.mlp.fc2.weight", "T"),
            (("mlp", "fc2", "bias"), f"{base}.mlp.fc2.bias", None),
        ]
        for path, tkey, tr in pairs:
            if tkey not in sd:
                skipped.append(tkey)
                continue
            dst = blk
            for seg in path[:-1]:
                if seg not in dst:
                    dst = None
                    break
                dst = dst[seg]
            if dst is None or path[-1] not in dst:
                skipped.append(tkey)
                continue
            val = sd[tkey].T if tr else sd[tkey]
            put(dst, path[-1], val)

    # quant_proj: 1x1 conv2d (latent, D, 1, 1) or linear -> Dense kernel
    if "quant_proj.weight" in sd and "quant_proj" in p:
        w = sd["quant_proj.weight"]
        w = w.reshape(w.shape[0], -1)  # (latent, D)
        put(p["quant_proj"], "kernel", w.T)
        if "quant_proj.bias" in sd and "bias" in p["quant_proj"]:
            put(p["quant_proj"], "bias", sd["quant_proj.bias"])

    if verbose:
        print(f"DiVAE warm start: copied {len(copied)} tensors, "
              f"skipped {len(skipped)} reference keys without a target")
    return {"params": p}


# ---------------------------------------------------------------- 2D (image)
def _cosmos2d_torch_key(path: Tuple[str, ...]) -> str:
    """flax path inside the 2D image tokenizer -> reference torch key base
    (reference module layout: cosmos_tokenizer/modules/layers2d.py:150-368)."""
    out = []
    for p in path:
        m = re.fullmatch(r"(down|up)_(\d+)_(block|attn)_(\d+)", p)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}.{m.group(3)}.{m.group(4)}")
            continue
        m = re.fullmatch(r"(down|up)_(\d+)_(downsample|upsample)", p)
        if m:
            out.append(f"{m.group(1)}.{m.group(2)}.{m.group(3)}")
            continue
        m = re.fullmatch(r"mid_(attn_1|block_\d+)", p)
        if m:
            out.append(f"mid.{m.group(1)}")
            continue
        if p == "norm" and out and out[-1].split(".")[-1].startswith("norm"):
            continue  # Normalize2d's inner GroupNorm ("norm1.norm" -> "norm1")
        out.append(p)
    return ".".join(out)


def convert_cosmos_image_state_dict(sd: Dict, flax_params: Dict) -> Dict:
    """Cosmos CI/DI torch state_dict -> flax params tree (conv2d OIHW ->
    HWIO; GroupNorm weight -> scale)."""
    flat = _flatten(flax_params["params"])
    out = {}
    for path, leaf in flat.items():
        name = "/".join(path)
        tbase = _cosmos2d_torch_key(path[:-1])
        leafname = path[-1]
        if leafname == "kernel":
            val = _t(sd[tbase + ".weight"]).transpose(2, 3, 1, 0)
        elif leafname == "scale":
            val = _t(sd[tbase + ".weight"])
        elif leafname == "bias":
            val = _t(sd[tbase + ".bias"])
        elif leafname == "embedding":  # taming VQ codebook
            val = _t(sd[tbase + ".embedding.weight"])
        else:
            raise KeyError(name)
        out[path] = _check(name, leaf.shape, val).astype(np.float32)
    return {"params": _unflatten(out)}


def load_cosmos_image_pth(encoder_path: str, decoder_path: str = None,
                          cfg=None, discrete: bool = True):
    """Load Cosmos CI/DI weights from TorchScript encoder.jit / decoder.jit
    (or a plain .pth with the full network state_dict)
    (reference: cosmos_tokenizer/utils.py load_model/load_encoder_model)."""
    import jax
    import jax.numpy as jnp
    import torch

    from egom2p_tpu.tokenizers.cosmos.image_api import ImageTokenizer
    from egom2p_tpu.tokenizers.cosmos.image_network import (
        CI_CONFIG, ContinuousImageTokenizer, DI_CONFIG,
        DiscreteImageTokenizer)

    cfg = cfg or (DI_CONFIG if discrete else CI_CONFIG)

    def read_sd(p):
        if p.endswith(".jit"):
            return torch.jit.load(p, map_location="cpu").state_dict()
        ckpt = torch.load(p, map_location="cpu", weights_only=False)
        return ckpt.get("model", ckpt)

    sd = dict(read_sd(encoder_path))
    if decoder_path:
        sd.update(read_sd(decoder_path))
    # drop derived quantizer buffers but keep a VQ codebook if present
    sd = {k: v for k, v in sd.items() if not k.startswith("inv_quant")
          and not (k.startswith("quantizer") and "embedding" not in k)
          and not k.startswith("distribution")}

    module = (DiscreteImageTokenizer if discrete
              else ContinuousImageTokenizer)(cfg)
    x0 = jnp.zeros((1, cfg.resolution, cfg.resolution, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: module.init(k, x0), jax.random.PRNGKey(0))
    params = convert_cosmos_image_state_dict(sd, shapes)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    return ImageTokenizer(params, cfg, discrete=discrete)


# ---------------------------------------------------------- teacher towers
def convert_teacher_state_dict(sd: Dict, flax_params: Dict,
                               domain: str) -> Dict:
    """Torch teacher checkpoint -> ViTTeacher flax params.

    Handles the three published layouts the reference loads
    (run_training_vqvae.py:460-481): OpenAI CLIP visual towers
    (`visual.` prefix or bare, fused `in_proj` attention), torch.hub
    DINOv2 ViTs (LayerScale `gamma`, plain or fused-SwiGLU MLPs), and
    ImageBind's vision trunk (whose 2-frame Conv3d patch stem collapses
    to a 2D conv by summing the time taps, since PadIm2Video feeds the
    same image to both).
    """
    is_clip = domain.startswith("CLIP")
    is_dino = domain.startswith("DINOv2")
    is_ib = domain.startswith("ImageBind")
    if is_clip and any(k.startswith("visual.") for k in sd):
        sd = {k[len("visual."):]: v for k, v in sd.items()
              if k.startswith("visual.")}
    if is_ib:
        pre = "modality_preprocessors.vision."
        trunk = "modality_trunks.vision."
        remap = {}
        for k, v in sd.items():
            if k.startswith(pre) or k.startswith(trunk):
                remap[k] = v
        if remap:
            sd = remap

    swiglu_cache: Dict = {}

    def block_param(i, rest):
        if is_clip:
            tb = f"transformer.resblocks.{i}."
            if rest == ("norm1", "weight"):
                return _t(sd[tb + "ln_1.weight"])
            if rest == ("norm1", "bias"):
                return _t(sd[tb + "ln_1.bias"])
            if rest == ("norm2", "weight"):
                return _t(sd[tb + "ln_2.weight"])
            if rest == ("norm2", "bias"):
                return _t(sd[tb + "ln_2.bias"])
            if rest == ("attn", "qkv", "kernel"):
                return _t(sd[tb + "attn.in_proj_weight"]).T
            if rest == ("attn", "qkv", "bias"):
                return _t(sd[tb + "attn.in_proj_bias"])
            if rest == ("attn", "proj", "kernel"):
                return _dense(sd, tb + "attn.out_proj.weight")
            if rest == ("attn", "proj", "bias"):
                return _t(sd[tb + "attn.out_proj.bias"])
            if rest == ("mlp", "fc1", "kernel"):
                return _dense(sd, tb + "mlp.c_fc.weight")
            if rest == ("mlp", "fc1", "bias"):
                return _t(sd[tb + "mlp.c_fc.bias"])
            if rest == ("mlp", "fc2", "kernel"):
                return _dense(sd, tb + "mlp.c_proj.weight")
            if rest == ("mlp", "fc2", "bias"):
                return _t(sd[tb + "mlp.c_proj.bias"])
        elif is_dino:
            tb = f"blocks.{i}."
            simple = {
                ("norm1", "weight"): tb + "norm1.weight",
                ("norm1", "bias"): tb + "norm1.bias",
                ("norm2", "weight"): tb + "norm2.weight",
                ("norm2", "bias"): tb + "norm2.bias",
                ("attn", "qkv", "bias"): tb + "attn.qkv.bias",
                ("attn", "proj", "bias"): tb + "attn.proj.bias",
                ("ls1",): tb + "ls1.gamma",
                ("ls2",): tb + "ls2.gamma",
            }
            if rest in simple:
                return _t(sd[simple[rest]])
            if rest == ("attn", "qkv", "kernel"):
                return _dense(sd, tb + "attn.qkv.weight")
            if rest == ("attn", "proj", "kernel"):
                return _dense(sd, tb + "attn.proj.weight")
            if rest[0] == "mlp":
                if tb + "mlp.fc1.weight" in sd:  # plain MLP (B14)
                    name = {"fc1": "fc1", "fc2": "fc2"}[rest[1]]
                    key = tb + f"mlp.{name}." + (
                        "weight" if rest[2] == "kernel" else "bias")
                    return (_dense(sd, key) if rest[2] == "kernel"
                            else _t(sd[key]))
                # fused SwiGLU (G14): w12 rows = [gate; value], w3 = out
                if i not in swiglu_cache:
                    w12 = _t(sd[tb + "mlp.w12.weight"])
                    b12 = _t(sd[tb + "mlp.w12.bias"])
                    h = w12.shape[0] // 2
                    swiglu_cache[i] = {
                        ("fc1", "kernel"): w12[:h].T,
                        ("fc1", "bias"): b12[:h],
                        ("fc3", "kernel"): w12[h:].T,
                        ("fc3", "bias"): b12[h:],
                        ("fc2", "kernel"): _dense(sd, tb + "mlp.w3.weight"),
                        ("fc2", "bias"): _t(sd[tb + "mlp.w3.bias"]),
                    }
                return swiglu_cache[i][rest[1:]]
        else:  # ImageBind trunk
            tb = f"modality_trunks.vision.blocks.{i}."
            simple = {
                ("norm1", "weight"): tb + "norm_1.weight",
                ("norm1", "bias"): tb + "norm_1.bias",
                ("norm2", "weight"): tb + "norm_2.weight",
                ("norm2", "bias"): tb + "norm_2.bias",
                ("attn", "qkv", "bias"): tb + "attn.in_proj_bias",
                ("attn", "proj", "bias"): tb + "attn.out_proj.bias",
            }
            if rest in simple:
                return _t(sd[simple[rest]])
            if rest == ("attn", "qkv", "kernel"):
                return _t(sd[tb + "attn.in_proj_weight"]).T
            if rest == ("attn", "proj", "kernel"):
                return _dense(sd, tb + "attn.out_proj.weight")
            if rest[:2] == ("mlp", "fc1") or rest[:2] == ("mlp", "fc2"):
                key = tb + f"mlp.{rest[1]}." + (
                    "weight" if rest[2] == "kernel" else "bias")
                return (_dense(sd, key) if rest[2] == "kernel"
                        else _t(sd[key]))
        raise KeyError(f"no torch mapping for teacher param blocks.{i}.{rest}")

    def top_param(path):
        if is_clip:
            top = {
                ("patch_embed", "kernel"):
                    lambda: _t(sd["conv1.weight"]).transpose(2, 3, 1, 0),
                ("cls_token",):
                    lambda: _t(sd["class_embedding"]).reshape(1, 1, -1),
                ("pos_embed",):
                    lambda: _t(sd["positional_embedding"])[None],
                ("ln_pre", "weight"): lambda: _t(sd["ln_pre.weight"]),
                ("ln_pre", "bias"): lambda: _t(sd["ln_pre.bias"]),
                ("ln_post", "weight"): lambda: _t(sd["ln_post.weight"]),
                ("ln_post", "bias"): lambda: _t(sd["ln_post.bias"]),
                ("proj",): lambda: _t(sd["proj"]),
            }
        elif is_dino:
            top = {
                ("patch_embed", "kernel"):
                    lambda: _t(sd["patch_embed.proj.weight"]).transpose(
                        2, 3, 1, 0),
                ("patch_embed", "bias"):
                    lambda: _t(sd["patch_embed.proj.bias"]),
                ("cls_token",): lambda: _t(sd["cls_token"]),
                ("pos_embed",): lambda: _t(sd["pos_embed"]),
                ("ln_post", "weight"): lambda: _t(sd["norm.weight"]),
                ("ln_post", "bias"): lambda: _t(sd["norm.bias"]),
            }
        else:
            pv = "modality_preprocessors.vision."
            top = {
                ("patch_embed", "kernel"):
                    lambda: _t(sd[pv + "rgbt_stem.proj.1.weight"]).sum(
                        axis=2).transpose(2, 3, 1, 0),
                ("cls_token",): lambda: _t(sd[pv + "cls_token"]).reshape(
                    1, 1, -1),
                ("pos_embed",):
                    lambda: _t(sd[pv + "pos_embedding_helper.pos_embed"]),
                ("ln_pre", "weight"): lambda: _t(
                    sd["modality_trunks.vision.pre_transformer_layer.0.weight"]),
                ("ln_pre", "bias"): lambda: _t(
                    sd["modality_trunks.vision.pre_transformer_layer.0.bias"]),
            }
        if path in top:
            return top[path]()
        raise KeyError(f"no torch mapping for teacher param {path}")

    out = {}
    for path, leaf in _flatten(flax_params).items():
        name = "/".join(path)
        if path[0].startswith("blocks_"):
            i = int(path[0].split("_")[1])
            arr = block_param(i, path[1:])
        else:
            arr = top_param(path)
        if path == ("pos_embed",) and arr.shape != leaf.shape:
            # checkpoints store pos_embed at the pretrain grid (e.g. DINOv2
            # hub ships img_size 518 -> 1+37^2 positions); interpolate the
            # patch grid to this spec's size like the torch models do at
            # runtime (DINOv2 interpolate_pos_encoding, bicubic)
            arr = _interp_posemb(arr, leaf.shape[1])
        out[path] = _check(name, leaf.shape, arr.astype(np.float32))
    return _unflatten(out)


def _interp_posemb(arr: np.ndarray, n_target: int) -> np.ndarray:
    """(1, 1+g0^2, w) learned posemb -> (1, 1+g1^2, w): keep the cls slot,
    bicubic-resize the square patch grid."""
    from scipy.ndimage import zoom

    cls_tok, grid = arr[:, :1], arr[0, 1:]
    g0 = int(round(float(np.sqrt(grid.shape[0]))))
    g1 = int(round(float(np.sqrt(n_target - 1))))
    if g0 * g0 != grid.shape[0] or g1 * g1 != n_target - 1:
        raise ValueError(f"cannot interpolate posemb {arr.shape} -> "
                         f"{n_target} positions (non-square grid)")
    grid = grid.reshape(g0, g0, -1)
    # grid_mode=True + edge replication ~ torch F.interpolate(bicubic,
    # align_corners=False), the sampling DINOv2 interpolates with at runtime
    grid = zoom(grid, (g1 / g0, g1 / g0, 1.0), order=3, grid_mode=True,
                mode="nearest")
    return np.concatenate([cls_tok, grid.reshape(1, g1 * g1, -1)], axis=1)


def load_teacher_pth(path: str, domain: str) -> Dict:
    """Load a torch teacher checkpoint from disk into ViTTeacher params.

    Accepts OpenAI CLIP (full model or visual-only, incl. jit archives),
    DINOv2 hub, and ImageBind checkpoints; nested under 'state_dict' /
    'model' or flat."""
    import jax
    import jax.numpy as jnp
    import torch

    from egom2p_tpu.models.teachers import TEACHER_SPECS, ViTTeacher

    if path.endswith((".jit", ".pt")) :
        try:
            sd = torch.jit.load(path, map_location="cpu").state_dict()
        except RuntimeError:
            ckpt = torch.load(path, map_location="cpu", weights_only=False)
            sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    else:
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()

    spec = TEACHER_SPECS[domain]
    module = ViTTeacher(spec)
    x0 = jnp.zeros((1, spec.image_size, spec.image_size, 3), jnp.float32)
    shapes = jax.eval_shape(lambda k: module.init(k, x0),
                            jax.random.PRNGKey(0))
    params = convert_teacher_state_dict(dict(sd), shapes["params"], domain)
    return {"params": jax.tree_util.tree_map(jnp.asarray, params)}

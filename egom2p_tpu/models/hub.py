"""HF-hub-style `FM` wrapper: one-call model + weight loading.

Equivalent of the reference's `FM(EgoM2P, PyTorchModelHubMixin)` wrapper
(reference: egom2p/models/egom2p_model.py:826-880), which reconstructs the
model from a `config.json`-style dict and pulls weights from a local
directory or the HuggingFace hub.  This environment has zero egress, so hub
ids resolve only through a local cache directory (`HF_HOME`-style layout) or
an explicit local path; a remote download request raises a clear error.

Supported weight formats inside a checkpoint directory:
  * `model.safetensors` / `pytorch_model.bin` / `*.pth` (reference torch
    checkpoints, converted via compat.torch_convert), or
  * an orbax checkpoint directory written by this repo's trainer.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional, Tuple

_CONFIG_KEYS = (
    "dim", "encoder_depth", "decoder_depth", "num_heads", "mlp_ratio",
    "qkv_bias", "proj_bias", "mlp_bias", "norm_bias", "gated_mlp", "qk_norm",
    "decoder_causal_mask", "decoder_sep_mask", "num_register_tokens",
    "share_modality_embeddings", "use_act_checkpoint", "remat_policy",
    "compute_dtype",
)


def _model_from_config(config: Dict):
    """config dict (reference layout: domains_in/domains_out + arch fields)
    -> EgoM2P module."""
    from egom2p_tpu.data.modality_info import MODALITY_INFO
    from egom2p_tpu.models.egom2p import EgoM2P, EgoM2PConfig

    kw = {k: config[k] for k in _CONFIG_KEYS if k in config}
    act = config.get("act_layer", config.get("act"))
    if act:
        kw["act"] = {"GELU": "gelu", "SiLU": "silu"}.get(act, str(act).lower())
    cfg = EgoM2PConfig(**kw)
    info = config.get("modality_info") or MODALITY_INFO
    return EgoM2P(config=cfg,
                  in_domains=tuple(config["domains_in"]),
                  out_domains=tuple(config["domains_out"]),
                  modality_info=info)


class FM:
    """Bundles an EgoM2P flax module with its params.

    `FM.from_pretrained(path_or_id)` mirrors the reference wrapper's entry
    point; the instance is callable like the bare module with params bound."""

    def __init__(self, model, params):
        self.model = model
        self.params = params

    def __call__(self, mod_dict, num_encoder_tokens: int,
                 num_decoder_tokens: int, *args, **kwargs):
        return self.model.apply(self.params, mod_dict, num_encoder_tokens,
                                num_decoder_tokens, *args, **kwargs)

    # ------------------------------------------------------------- loading
    @classmethod
    def from_pretrained(cls, path_or_id: str,
                        config: Optional[Dict] = None) -> "FM":
        path = cls._resolve_local(path_or_id)
        if path is None:
            raise RuntimeError(
                f"{path_or_id!r} is not a local path and this environment "
                "has no network egress. Download the checkpoint elsewhere "
                "and pass its local directory (config.json + "
                "model.safetensors / pytorch_model.bin / *.pth).")
        if os.path.isfile(path):  # bare .pth: args namespace is pickled inside
            return cls._from_pth(path, config)

        cfg_file = os.path.join(path, "config.json")
        if config is None:
            if not os.path.exists(cfg_file):
                raise FileNotFoundError(f"no config.json under {path}")
            with open(cfg_file) as f:
                config = json.load(f)
        model = _model_from_config(config)

        for name in ("model.safetensors", "pytorch_model.bin"):
            fp = os.path.join(path, name)
            if os.path.exists(fp):
                return cls(model, cls._load_torch_weights(fp, model))
        pths = [f for f in sorted(os.listdir(path)) if f.endswith(".pth")]
        if pths:
            from egom2p_tpu.compat.torch_convert import load_egom2p_pth
            return cls(model, load_egom2p_pth(os.path.join(path, pths[0]),
                                              model))
        # orbax checkpoint directory written by run_training_egom2p.py
        from egom2p_tpu.core.checkpoint import restore_params
        return cls(model, restore_params(path, model))

    @staticmethod
    def _resolve_local(path_or_id: str) -> Optional[str]:
        if os.path.exists(path_or_id):
            return path_or_id
        # HF_HOME-style local cache: hub/models--org--name/snapshots/<rev>
        cache = os.environ.get("HF_HOME", os.path.expanduser("~/.cache/huggingface"))
        slug = "models--" + path_or_id.replace("/", "--")
        snap_root = os.path.join(cache, "hub", slug, "snapshots")
        if os.path.isdir(snap_root):
            # refs/main names the current revision; hash sort order is
            # meaningless when several snapshots exist
            ref = os.path.join(cache, "hub", slug, "refs", "main")
            if os.path.isfile(ref):
                with open(ref) as f:
                    rev = f.read().strip()
                cand = os.path.join(snap_root, rev)
                if os.path.isdir(cand):
                    return cand
            snaps = sorted(os.listdir(snap_root))
            if snaps:
                return os.path.join(snap_root, snaps[-1])
        return None

    @classmethod
    def _from_pth(cls, path: str, config: Optional[Dict]) -> "FM":
        from egom2p_tpu.compat.torch_convert import (load_egom2p_pth,
                                                     read_pth_args)
        if config is None:
            args = read_pth_args(path)
            if args is None:
                raise ValueError(f"{path} has no pickled args; pass config=")
            from egom2p_tpu.models.egom2p import create_model
            model = create_model(args.model,
                                 in_domains=sorted(args.in_domains),
                                 out_domains=sorted(args.out_domains))
        else:
            model = _model_from_config(config)
        return cls(model, load_egom2p_pth(path, model))

    @staticmethod
    def _load_torch_weights(fp: str, model):
        import jax
        import jax.numpy as jnp

        from egom2p_tpu.compat.torch_convert import convert_egom2p_state_dict
        if fp.endswith(".safetensors"):
            from safetensors.numpy import load_file
            sd = load_file(fp)
        else:
            import torch
            sd = torch.load(fp, map_location="cpu", weights_only=False)
            sd = sd.get("model", sd) if isinstance(sd, dict) else sd
        from egom2p_tpu.data.modality_info import MODALITY_INFO
        md = {}
        # every in OR out domain must appear in the dummy init input, with
        # the tensor shape its embedding expects, or eval_shape misses the
        # corresponding params and the converter drops those weights
        for m in sorted(set(model.in_domains) | set(model.out_domains)):
            info = (model.mod_info if model.modality_info else MODALITY_INFO)[m]
            L = info["max_tokens"]
            spec = info.get("embed_spec", {})
            kind = spec.get("kind", "")
            if kind == "sequence_emb":
                tensor = jnp.zeros((1, L, spec["orig_emb_dim"]), jnp.float32)
            elif kind == "image_raw":
                size, ch = spec["image_size"], spec["num_channels"]
                tensor = jnp.zeros((1, size, size, ch), jnp.float32)
            else:
                tensor = jnp.zeros((1, L), jnp.int32)
            md[m] = {"tensor": tensor,
                     "input_mask": jnp.ones((1, L), bool),
                     "target_mask": jnp.zeros((1, L), bool),
                     "decoder_attention_mask": jnp.zeros((1, L), jnp.int32)}
        shapes = jax.eval_shape(lambda k: model.init(k, md, 64, 64),
                                jax.random.PRNGKey(0))
        converted = convert_egom2p_state_dict(sd, shapes, model.in_domains,
                                              model.out_domains)
        return jax.tree_util.tree_map(jnp.asarray, converted)

"""3-tier YAML config system.

Same user surface as the reference: a main training YAML whose keys become
argparse defaults overridable from the CLI (reference:
run_training_egom2p.py:224-239), pointing to a data config YAML (datasets,
domains, shard paths, weights) and per-dataset Dirichlet alphas configs
(reference: cfgs/default/egom2p/**, loaded in egom2p/data/pretrain_utils.py:30-83).
"""
from __future__ import annotations

import argparse
import copy
import os
from typing import Any, Dict, List, Optional, Tuple

import yaml


def str2bool(v) -> bool:
    """Argparse-safe bool: `--flag False` must mean False.  (`type=bool` makes
    any non-empty string truthy — the reference inherits that footgun; we
    don't.)"""
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("1", "true", "t", "yes", "y", "on"):
        return True
    if s in ("0", "false", "f", "no", "n", "off"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def parse_args_with_config(parser: argparse.ArgumentParser, argv=None):
    """Two-stage parse: --config YAML values become defaults, CLI overrides
    (reference: run_training_egom2p.py:224-239)."""
    config_parser = argparse.ArgumentParser(add_help=False)
    config_parser.add_argument("--config", default=None, type=str)
    args_config, remaining = config_parser.parse_known_args(argv)
    if args_config.config:
        with open(args_config.config) as f:
            cfg = yaml.safe_load(f)
        known = {a.dest for a in parser._actions}
        unknown = set(cfg) - known
        if unknown:
            print(f"[config] ignoring unknown keys: {sorted(unknown)}")
        parser.set_defaults(**{k: v for k, v in cfg.items() if k in known})
    args = parser.parse_args(remaining)
    args.config = args_config.config
    return args


def load_data_config(path: str) -> Dict:
    with open(path) as f:
        return yaml.safe_load(f)


def setup_sampling_mod_info(dataset_config: Dict, modality_info: Dict,
                            config_root: str = ".") -> Tuple[Dict, Optional[List[float]]]:
    """Per-dataset modality info with Dirichlet alphas
    (reference: egom2p/data/pretrain_utils.py:30-83)."""
    in_domains = sorted(dataset_config["in_domains"].split("-"))
    out_domains = sorted(dataset_config["out_domains"].split("-"))
    all_domains = sorted(set(in_domains) | set(out_domains))

    mod_info = copy.deepcopy({m: modality_info[m] for m in all_domains})

    alphas_config = dataset_config.get("alphas_config")
    if alphas_config is None:
        for m in mod_info:
            mod_info[m]["input_alphas"] = [0.0]
            mod_info[m]["target_alphas"] = [0.0]

        def parse(v, domains):
            parts = str(v).split("-")
            vals = ([float(parts[0])] * len(domains) if len(parts) == 1
                    else [float(p) for p in parts])
            return vals

        # NOTE parity quirk: alphas zip against the SORTED domain list, not
        # the hyphen order the user wrote — exactly like the reference
        # (pretrain_utils.py:34+53), whose shipped configs list domains
        # alphabetically.  Kept for config compatibility.
        if dataset_config.get("input_alphas") is not None:
            for m, a in zip(in_domains, parse(dataset_config["input_alphas"],
                                              in_domains)):
                mod_info[m]["input_alphas"] = [a]
        if dataset_config.get("target_alphas") is not None:
            for m, a in zip(out_domains, parse(dataset_config["target_alphas"],
                                               out_domains)):
                mod_info[m]["target_alphas"] = [a]
        sampling_weights = None
    else:
        p = alphas_config if os.path.isabs(alphas_config) else os.path.join(
            config_root, alphas_config)
        if not os.path.exists(p):
            p = alphas_config  # relative to cwd like the reference
        with open(p) as f:
            alphas = yaml.safe_load(f)
        sampling_weights = alphas.get("sampling_weights")
        mixture = alphas.get("alphas_mixture", alphas)
        for m in mod_info:
            mod_info[m]["input_alphas"] = mixture[m]["input_alphas"]
            mod_info[m]["target_alphas"] = mixture[m]["target_alphas"]
            if modality_info[m]["type"] in ("seq", "seq_emb", "seq_token"):
                mod_info[m]["keep"] = mixture[m]["keep"]
    return mod_info, sampling_weights


def setup_run_name(args) -> None:
    """Derive run name / output dir from the config path when set to 'auto'
    (reference: egom2p/utils/run_name.py:14-27)."""
    if getattr(args, "run_name", None) == "auto":
        if args.config:
            base = os.path.splitext(os.path.basename(args.config))[0]
        else:
            base = getattr(args, "model", "run")
        args.run_name = base
    if getattr(args, "output_dir", "").endswith("auto"):
        args.output_dir = args.output_dir[: -len("auto")] + args.run_name
    if getattr(args, "wandb_run_name", None) == "auto":
        args.wandb_run_name = args.run_name

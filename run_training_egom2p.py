#!/usr/bin/env python
"""EgoM2P pretraining entry point (TPU-native).

Same user surface as the reference trainer (reference:
run_training_egom2p.py): a 3-tier YAML config (--config -> data_config ->
alphas_config), token-budget-derived epochs, cosine/inverse-sqrt schedules,
periodic checkpoints and eval.  DDP-over-NCCL becomes a (replica, data) device
mesh with batch sharding (see egom2p_tpu/train/egom2p_train.py).

Run on real data:
    python run_training_egom2p.py --config cfgs/egom2p/main_mod4.yaml
Smoke-run without data (synthetic token streams):
    python run_training_egom2p.py --config cfgs/egom2p/main_mod4.yaml \
        --synthetic_data --total_tokens -1 --epochs 1 --epoch_size 64
"""
from __future__ import annotations

import argparse
import math
import os
import time

import numpy as np


def get_args(argv=None):
    from egom2p_tpu.core.config import parse_args_with_config, str2bool

    p = argparse.ArgumentParser("EgoM2P pretraining",
                                allow_abbrev=False)
    # Input & output (reference: ego-b...yaml:7-11)
    p.add_argument("--run_name", default="auto")
    p.add_argument("--num_input_tokens", type=int, default=2048)
    p.add_argument("--num_target_tokens", type=int, default=2048)
    p.add_argument("--loss_type", default="mod",
                   choices=["mod", "modality", "weighted_mod", "token"])
    # Architecture
    p.add_argument("--model", default="egom2p_base_12e_12d_swiglu_nobias")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--num_register_tokens", type=int, default=0)
    p.add_argument("--fsdp", type=str2bool, default=False,
                   help="shard params + optimizer moments over the data "
                        "axis (ZeRO-style; reference ships unused FSDP "
                        "plumbing, fsdp_utils.py:33-116)")
    p.add_argument("--tensor_parallel", type=int, default=1,
                   help="model-axis size for Megatron-style tensor "
                        "parallelism (exceeds the reference, which is "
                        "DP-only); composes with --fsdp (TP x ZeRO). "
                        "TP>1 runs attention on the XLA path (the Pallas "
                        "flash custom call cannot be GSPMD-partitioned)")
    p.add_argument("--use_act_checkpoint", type=str2bool, default=False,
                   help="rematerialize blocks in backward.  OFF by default: "
                        "with bf16 compute the shipped batch 8 fits a 16GB "
                        "chip without it and runs +52% faster (46.0k -> "
                        "69.9k tok/s measured, docs/TRAINING.md); turn on "
                        "only for micro-batches that exceed HBM — for "
                        "bigger GLOBAL batches prefer --accum_steps, which "
                        "keeps activations at the micro-batch level")
    p.add_argument("--remat_policy", type=str, default="full",
                   choices=["full", "dots"],
                   help="remat granularity: full recomputes whole blocks, "
                        "dots saves matmul outputs and recomputes only "
                        "elementwise ops (less recompute, more HBM)")
    # Train
    p.add_argument("--epochs", type=int, default=-1)
    p.add_argument("--total_tokens", type=float, default=500,
                   help="in billions; derives epochs (reference: :433-460)")
    p.add_argument("--opt", default="adamw")
    p.add_argument("--opt_betas", type=float, nargs=2, default=[0.9, 0.95])
    p.add_argument("--blr", type=float, default=1e-4)
    p.add_argument("--min_blr", type=float, default=0.0)
    p.add_argument("--warmup_epochs", type=int, default=-1)
    p.add_argument("--warmup_tokens", type=float, default=10)
    p.add_argument("--warmup_steps", type=int, default=-1)
    p.add_argument("--batch_size", type=int, default=4,
                   help="per data-parallel shard")
    p.add_argument("--accum_steps", type=int, default=1)
    p.add_argument("--weight_decay", type=float, default=0.05)
    p.add_argument("--clip_grad", type=float, default=1.0)
    p.add_argument("--lr_schedule", default="cosine",
                   choices=["cosine", "inverse_sqrt", "constant"])
    p.add_argument("--seed", type=int, default=0)
    # Data
    p.add_argument("--data_config", default=None)
    p.add_argument("--epoch_size", type=int, default=1_000_000)
    p.add_argument("--num_workers", type=int, default=0,
                   help="forked data-loader worker processes (reference "
                        "DataLoader num_workers); 0 = in-process thread")
    p.add_argument("--eval_freq", type=int, default=1)
    # reference defaults fixed_eval ON with pinned 128/128 budgets
    # (reference: run_training_egom2p.py:166-173)
    p.add_argument("--fixed_eval", action="store_true", default=True)
    p.add_argument("--no_fixed_eval", dest="fixed_eval", action="store_false")
    p.add_argument("--fixed_eval_input_tokens", type=int, default=128)
    p.add_argument("--fixed_eval_target_tokens", type=int, default=128)
    p.add_argument("--text_tokenizer_path", default=None)
    p.add_argument("--synthetic_data", action="store_true",
                   help="random token streams instead of tar shards")
    p.add_argument("--finetune", default=None,
                   help="warm-start checkpoint (orbax dir or reference .pth); "
                        "non-matching/pos-emb params keep their init "
                        "(reference: run_training_egom2p.py:477-489)")
    p.add_argument("--input_domains", default=None,
                   help="hyphen-separated; with --target_domains switches to "
                        "TransferMasking finetuning (reference: masking.py:567)")
    p.add_argument("--target_domains", default=None)
    p.add_argument("--eval_iters", type=int, default=10)
    p.add_argument("--frozen_model_epochs", type=int, default=0,
                   help="freeze the shared transformer trunk for the first N "
                        "epochs (reference: run_training_egom2p.py:686-693)")
    p.add_argument("--profile", action="store_true",
                   help="capture a jax.profiler trace of a few steps")
    p.add_argument("--scaled_modalities", action="store_true",
                   help="tiny vocab/grid modality registry (CI smoke runs)")
    # Saving / logging
    p.add_argument("--save_ckpt_freq", type=int, default=1)
    p.add_argument("--async_save", type=str2bool, default=True,
                   help="periodic checkpoint writes on a background thread "
                        "(the final save always blocks)")
    p.add_argument("--output_dir", default="output/egom2p")
    p.add_argument("--auto_resume", action="store_true", default=True)
    p.add_argument("--no_auto_resume", dest="auto_resume", action="store_false")
    p.add_argument("--log_wandb", action="store_true", default=False)
    p.add_argument("--no_log_wandb", dest="log_wandb", action="store_false")
    p.add_argument("--wandb_project", default="egom2p-train")
    p.add_argument("--wandb_entity", default=None)
    p.add_argument("--wandb_run_name", default="auto")
    p.add_argument("--print_freq", type=int, default=10)
    # S3 checkpoint sync (reference: checkpoint.py:113-120 + s3_utils.py):
    # uploads each saved checkpoint-{tag}/ and auto-downloads the latest on
    # resume when no local checkpoint exists.  Needs boto3 + credentials.
    p.add_argument("--s3_save_dir", default=None,
                   help="s3://bucket/prefix to mirror checkpoints into")
    p.add_argument("--s3_endpoint", default=None)
    # unused-but-accepted reference keys (config compatibility)
    p.add_argument("--s3_data_endpoint", default=None)
    return parse_args_with_config(p, argv)


def expand_modality_shards(path: str, mod_info, fallback_name: str,
                           split: bool = True):
    """Expand '[rgb,depth]/.../shard-{000..195}.tar' into per-modality
    aligned shard lists.

    split=True partitions the shards across processes (training streams —
    reference per-rank wds splitting, egom2p/data/unified_datasets.py:392);
    split=False keeps the full list on every process (validation streams:
    all hosts must agree on the batch count, each host then slices its own
    rows out of the identical global batch — see
    core/distributed.global_batch_from_replicated)."""
    import re

    import jax
    from egom2p_tpu.data.tar_reader import braceexpand, shard_split

    m = re.search(r"\[([^\]]+)\]", path)
    mods_in_path = m.group(1).split(",") if m else [""]
    per_mod = {}
    for mp in mods_in_path:
        expanded = braceexpand(
            path.replace(f"[{m.group(1)}]", mp) if m else path)
        # modality key: match tok_<name> by path component
        mod_key = next((k for k, v in mod_info.items()
                        if v.get("path") == mp), mp or fallback_name)
        per_mod[mod_key] = (shard_split(expanded, jax.process_index(),
                                        jax.process_count())
                           if split else expanded)
    return per_mod


def setup_data(args, mesh):
    """Build the train mixture loader (reference: run_training_egom2p.py:256-351)."""
    from egom2p_tpu.core.config import load_data_config, setup_sampling_mod_info
    from egom2p_tpu.core.mesh import local_num_data_shards
    from egom2p_tpu.data.mixture import DatasetStream, MixtureLoader
    from egom2p_tpu.data.modality_info import MODALITY_INFO
    from egom2p_tpu.data.tar_reader import (braceexpand,
                                            multi_tarfile_samples, repeated,
                                            shard_split, shuffled)
    from egom2p_tpu.masking.unified import UnifiedMasking
    import random as pyrandom

    import jax

    # PER-PROCESS batch: each host loads only the rows its own devices
    # consume (1/P of the global batch); the train loop stitches them into
    # a global array with global_batch_from_local.  The reference loads
    # per-rank too (unified_datasets.py:392).
    local_batch = (args.batch_size * local_num_data_shards(mesh)
                   * args.accum_steps)

    text_tokenizer = None
    if args.text_tokenizer_path:
        from egom2p_tpu.utils.text_tokenizer import load_text_tokenizer
        text_tokenizer = load_text_tokenizer(args.text_tokenizer_path)

    all_domains = set()
    streams, weights = [], None

    if args.synthetic_data:
        mods = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")
        all_domains = set(mods)
        if args.scaled_modalities:
            from egom2p_tpu.data.modality_info import make_scaled_modality_info
            info = make_scaled_modality_info()
        else:
            info = {m: dict(MODALITY_INFO[m]) for m in mods}
        for m in info:
            info[m]["input_alphas"] = [0.01, 0.1, 1.0, 10.0]
            info[m]["target_alphas"] = [0.01, 0.1, 1.0, 10.0]
        if args.input_domains and args.target_domains:
            from egom2p_tpu.masking import TransferMasking
            masking = TransferMasking(info, text_tokenizer,
                                      args.input_domains.split("-"),
                                      args.target_domains.split("-"))
        else:
            masking = UnifiedMasking(info, text_tokenizer,
                                     args.num_input_tokens,
                                     args.num_target_tokens,
                                     sampling_weights=[1.0] * 4, seed=args.seed)
        rng = np.random.default_rng(args.seed)
        # fixed pool so short smoke runs can demonstrably memorize
        pool = [{m: rng.integers(0, info[m]["vocab_size"],
                                 size=info[m]["max_tokens"]).astype(np.int32)
                 for m in mods} for _ in range(256)]

        def synth():
            while True:
                yield from pool

        streams = [DatasetStream("synthetic", synth, masking)]
    else:
        assert args.data_config, "--data_config required without --synthetic_data"
        dc = load_data_config(args.data_config)
        train = dc["train"]
        weights = train.get("weights")
        for name, dcfg in train["datasets"].items():
            mod_info, sampling_weights = setup_sampling_mod_info(
                dcfg, MODALITY_INFO)
            all_domains |= set(mod_info)
            masking = UnifiedMasking(
                mod_info, text_tokenizer,
                dcfg.get("num_input_tokens") or args.num_input_tokens,
                dcfg.get("num_target_tokens") or args.num_target_tokens,
                sampling_weights=sampling_weights, seed=args.seed)
            if dcfg.get("type") == "huggingface":
                # HF-datasets source (reference: unified_datasets.py:448-489)
                from egom2p_tpu.data.hf_datasets import huggingface_samples

                def hf_factory(seed=None, dcfg=dcfg):
                    return huggingface_samples(
                        dcfg["data_path"],
                        split=dcfg.get("split", "train"),
                        shuffle_buffer=dcfg.get("shuffle_buffer_load", 1000),
                        seed=seed if seed is not None else args.seed)

                streams.append(DatasetStream(name, hf_factory, masking))
                continue
            per_mod = expand_modality_shards(dcfg["data_path"], mod_info,
                                             name)
            n_rep = dcfg.get("wds_n_repeats", 1)
            buf = dcfg.get("wds_shuffle_buffer_tar", 1000)
            pyr = pyrandom.Random(args.seed)

            def factory(seed=None, worker_id=0, num_workers=1,
                        per_mod=per_mod, n_rep=n_rep, buf=buf, pyr=pyr):
                # worker processes pass their own seed for an independent
                # shuffle order plus a per-worker shard split, so N workers
                # partition the shard list instead of each re-reading all of
                # it (reference wds worker splitter,
                # unified_datasets.py:373-398)
                r = pyrandom.Random(seed) if seed is not None else pyr
                pm = per_mod
                n_shards = min(len(v) for v in per_mod.values())
                if num_workers > 1 and n_shards >= num_workers:
                    pm = {k: shard_split(v, worker_id, num_workers)
                          for k, v in per_mod.items()}
                return shuffled(
                    repeated(lambda: multi_tarfile_samples(pm), n_rep),
                    buf, r)

            streams.append(DatasetStream(name, factory, masking))

    info_all = {m: MODALITY_INFO[m] for m in sorted(all_domains)}
    loader = MixtureLoader(streams, weights, info_all, local_batch,
                           seed=args.seed + jax.process_index() * 7919,
                           num_workers=args.num_workers)
    return loader, sorted(all_domains)


def setup_val_data(args, mesh):
    """Build genuinely held-out validation + fixed_eval loader factories
    (reference: run_training_egom2p.py:317-351, pretrain_utils.py:196-293).

    Returns (val_factories, fixed_factories): dicts mapping dataset name to a
    zero-arg callable producing a fresh batch iterator over the SAME held-out
    data.  val loaders draw random token budgets like training; fixed_eval
    loaders pin per-sample budgets to (fixed_eval_input_tokens,
    fixed_eval_target_tokens) with a pinned masking seed, so the fixed-eval
    batches are identical every epoch."""
    from egom2p_tpu.core.config import load_data_config, setup_sampling_mod_info
    from egom2p_tpu.core.mesh import num_data_shards
    from egom2p_tpu.data.mixture import DatasetStream, MixtureLoader
    from egom2p_tpu.data.modality_info import MODALITY_INFO
    from egom2p_tpu.data.tar_reader import multi_tarfile_samples
    from egom2p_tpu.masking.unified import UnifiedMasking

    batch = args.batch_size * num_data_shards(mesh)
    text_tokenizer = None
    if args.text_tokenizer_path:
        from egom2p_tpu.utils.text_tokenizer import load_text_tokenizer
        text_tokenizer = load_text_tokenizer(args.text_tokenizer_path)

    def masks_for(mod_info, sampling_weights, fixed):
        if fixed:
            return UnifiedMasking(
                mod_info, text_tokenizer,
                (args.fixed_eval_input_tokens,) * 2,
                (args.fixed_eval_target_tokens,) * 2,
                sampling_weights=sampling_weights,
                seed=args.seed + 77777)  # pinned: identical every epoch
        return UnifiedMasking(mod_info, text_tokenizer,
                              args.num_input_tokens, args.num_target_tokens,
                              sampling_weights=sampling_weights,
                              seed=args.seed + 9999)

    val_factories, fixed_factories = {}, {}

    if args.synthetic_data:
        mods = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")
        if args.scaled_modalities:
            from egom2p_tpu.data.modality_info import make_scaled_modality_info
            info = make_scaled_modality_info()
        else:
            info = {m: dict(MODALITY_INFO[m]) for m in mods}
        for m in info:
            info[m]["input_alphas"] = [0.01, 0.1, 1.0, 10.0]
            info[m]["target_alphas"] = [0.01, 0.1, 1.0, 10.0]
        # held-out pool: DIFFERENT seed stream than the train pool -> disjoint
        rng = np.random.default_rng(args.seed + 500_000)
        pool = [{m: rng.integers(0, info[m]["vocab_size"],
                                 size=info[m]["max_tokens"]).astype(np.int32)
                 for m in mods} for _ in range(64)]

        def make_factory(fixed):
            def factory():
                def stream():
                    yield from pool

                s = DatasetStream("synthetic_val", stream,
                                  masks_for(info, [1.0] * 4, fixed))
                loader = MixtureLoader([s], None, info, batch,
                                       seed=args.seed + 31337, prefetch=1)
                return iter(loader)
            return factory

        val_factories["synthetic_val"] = make_factory(False)
        fixed_factories["synthetic_val"] = make_factory(True)
        return val_factories, fixed_factories

    dc = load_data_config(args.data_config)
    if "val" not in dc:
        return {}, {}
    train_cfgs = dc.get("train", {}).get("datasets", {})
    for name, dcfg in dc["val"]["datasets"].items():
        base = dict(train_cfgs.get(name, {}))
        base.update({k: v for k, v in dcfg.items() if v is not None})
        mod_info, sampling_weights = setup_sampling_mod_info(base, MODALITY_INFO)
        # split=False: every host reads the SAME full val stream (global
        # batch size) so all hosts agree on the batch count; each slices
        # its local rows at assembly time (global_batch_from_replicated).
        per_mod = expand_modality_shards(base["data_path"], mod_info, name,
                                         split=False)

        def make_factory(per_mod=per_mod, mod_info=mod_info,
                         sw=sampling_weights, fixed=False, name=name):
            def factory():
                # sequential, non-shuffled, single pass over held-out shards
                s = DatasetStream(name,
                                  lambda: multi_tarfile_samples(per_mod),
                                  masks_for(mod_info, sw, fixed))
                loader = MixtureLoader([s], None, mod_info, batch,
                                       seed=args.seed + 31337, prefetch=1)
                return iter(loader)
            return factory

        val_factories[name] = make_factory()
        fixed_factories[name] = make_factory(fixed=True)
    return val_factories, fixed_factories


def main(args):
    import resource
    # many-shard tar loading needs a high fd limit
    # (reference: run_training_egom2p.py:840-841)
    try:
        soft, hard = resource.getrlimit(resource.RLIMIT_NOFILE)
        resource.setrlimit(resource.RLIMIT_NOFILE, (hard, hard))
    except (ValueError, OSError):
        pass
    from egom2p_tpu.core.config import setup_run_name
    setup_run_name(args)
    import jax
    from egom2p_tpu.core.distributed import init_distributed_mode
    # multi-host rendezvous (env-driven: COORDINATOR_ADDRESS /
    # EGOM2P_NUM_PROCESSES / EGOM2P_PROCESS_ID; no-op single-host) — the
    # reference's init_distributed_mode (egom2p/utils/dist.py:78-100)
    dist = init_distributed_mode()
    from egom2p_tpu.core.cache import enable_persistent_cache
    from egom2p_tpu.core.checkpoint import (auto_load_model, save_checkpoint)
    from egom2p_tpu.core.logging import JsonlLogger, MetricLogger, WandbLogger
    from egom2p_tpu.core.mesh import make_mesh, num_data_shards
    from egom2p_tpu.core.optim import create_optimizer
    from egom2p_tpu.core.schedules import (as_optax_schedule, cosine_scheduler,
                                           constant_scheduler,
                                           inverse_sqrt_scheduler)
    from egom2p_tpu.models.egom2p import create_model
    from egom2p_tpu.train.egom2p_train import (init_train_state,
                                               jit_train_step, make_train_step)

    enable_persistent_cache()
    if args.tensor_parallel > 1:
        from egom2p_tpu.core.mesh import MeshConfig
        from egom2p_tpu.ops.attention import set_tp_flash_mesh
        from egom2p_tpu.ops.flash_attention import disable_flash
        disable_flash()  # Pallas custom calls can't be GSPMD-partitioned
        mesh = make_mesh(MeshConfig(model=args.tensor_parallel))
        # ...but attention is head-parallel: route hd-64 kernels through a
        # shard_map over the model axis instead of losing them entirely
        set_tp_flash_mesh(mesh)
    else:
        mesh = make_mesh()
    world = num_data_shards(mesh)
    global_batch = args.batch_size * world * args.accum_steps
    from egom2p_tpu.core.mesh import local_num_data_shards
    local_batch = args.batch_size * local_num_data_shards(mesh) * args.accum_steps
    print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}, "
          f"global batch {global_batch}, per-process loader batch "
          f"{local_batch} ({dist['process_count']} processes)")

    loader, all_domains = setup_data(args, mesh)
    val_factories, fixed_factories = setup_val_data(args, mesh)
    if val_factories:
        print(f"val datasets: {sorted(val_factories)}")

    # epochs / warmup derivation from token budgets (reference: :433-460)
    tokens_per_sample = args.num_input_tokens + args.num_target_tokens
    if args.epochs < 0:
        assert args.total_tokens > 0
        args.epochs = math.ceil(args.total_tokens * 1e9
                                / (tokens_per_sample * args.epoch_size))
        print(f"total tokens {args.total_tokens}B -> {args.epochs} epochs")
    if args.warmup_epochs < 0 and args.warmup_steps < 0:
        args.warmup_steps = math.ceil(args.warmup_tokens * 1e9
                                      / (tokens_per_sample * global_batch))

    niter_per_ep = max(args.epoch_size // global_batch, 1)
    lr = args.blr * global_batch / 256.0
    min_lr = args.min_blr * global_batch / 256.0
    if args.lr_schedule == "cosine":
        sched = cosine_scheduler(lr, min_lr, args.epochs, niter_per_ep,
                                 warmup_epochs=max(args.warmup_epochs, 0),
                                 warmup_steps=args.warmup_steps)
    elif args.lr_schedule == "inverse_sqrt":
        sched = inverse_sqrt_scheduler(lr, min_lr, args.epochs, niter_per_ep,
                                       warmup_epochs=max(args.warmup_epochs, 0),
                                       warmup_steps=args.warmup_steps)
    else:
        sched = constant_scheduler(lr, args.epochs, niter_per_ep)

    model_info = None
    if args.scaled_modalities:
        from egom2p_tpu.data.modality_info import make_scaled_modality_info
        model_info = make_scaled_modality_info()
    model = create_model(args.model, in_domains=all_domains,
                         out_domains=all_domains,
                         modality_info=model_info,
                         num_register_tokens=args.num_register_tokens,
                         use_act_checkpoint=bool(args.use_act_checkpoint),
                         remat_policy=args.remat_policy)

    from egom2p_tpu.core.distributed import (global_batch_from_local,
                                             global_batch_from_replicated)
    loader_it = iter(loader)
    first_batch = next(loader_it)  # PER-PROCESS rows (1/P of global)
    first_gbatch = global_batch_from_local(mesh, first_batch)
    md0 = {m: {k: np.asarray(v) for k, v in d.items()}
           for m, d in first_batch.items()}
    params = jax.jit(lambda k: model.init(
        k, md0, args.num_input_tokens, args.num_target_tokens))(
        jax.random.PRNGKey(args.seed))
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"model {args.model}: {n_params/1e6:.1f}M params")

    if args.finetune:
        params = _warm_start(params, args.finetune, model)

    optimizer = create_optimizer(params, as_optax_schedule(sched),
                                 weight_decay=args.weight_decay,
                                 betas=tuple(args.opt_betas),
                                 clip_grad=args.clip_grad)
    if args.frozen_model_epochs > 0:
        from egom2p_tpu.core.optim import freeze_until, shared_params_mask
        # wraps the optimizer: frozen grads are zeroed before clipping/Adam
        # and frozen updates after decay (reference requires_grad semantics)
        optimizer = freeze_until(args.frozen_model_epochs * niter_per_ep,
                                 shared_params_mask(params), optimizer)
    state = init_train_state(params, optimizer)

    start_epoch = 0
    if args.auto_resume and args.s3_save_dir:
        # fresh machine, checkpoints only in the bucket: pull the latest
        from egom2p_tpu.core.s3_sync import maybe_download_for_resume
        from egom2p_tpu.core.distributed import barrier, is_main_process
        if is_main_process():
            fetched = maybe_download_for_resume(
                args.output_dir, args.s3_save_dir,
                endpoint_url=args.s3_endpoint)
            if fetched:
                print(f"downloaded {fetched} from {args.s3_save_dir}")
        barrier("s3_resume_download")  # non-main hosts wait for the files
    if args.auto_resume:
        restored, path = auto_load_model(args.output_dir, state)
        if restored is not None:
            state = restored
            start_epoch = int(np.asarray(state.step)) // niter_per_ep
            print(f"resumed from {path} at epoch {start_epoch}")

    if jax.process_count() > 1:
        # place the host-built (or restored) state onto the global mesh:
        # numpy leaves are valid multi-process jit inputs (treated as
        # replicated host values) — committed process-local arrays are not
        from egom2p_tpu.train.egom2p_train import state_shardings
        st_sh = state_shardings(mesh, state, fsdp=args.fsdp,
                                tp=args.tensor_parallel > 1)
        state = jax.jit(lambda s: s, out_shardings=st_sh)(
            jax.tree_util.tree_map(np.asarray, state))

    step_fn = make_train_step(model, optimizer, args.num_input_tokens,
                              args.num_target_tokens, args.loss_type,
                              accum_steps=args.accum_steps)
    jstep = jit_train_step(mesh, step_fn, state, first_gbatch,
                           fsdp=args.fsdp, tp=args.tensor_parallel > 1)
    if jax.process_count() > 1:
        # AOT-compile (no cross-process comms), then host-rendezvous, so
        # every process enters the first collective together — the backend
        # collective-context bootstrap won't tolerate a cold-compile-vs-
        # cache-hit skew between hosts (Gloo gives peers ~30s)
        from egom2p_tpu.core.distributed import barrier
        jstep = jstep.lower(state, first_gbatch,
                            jax.random.PRNGKey(0)).compile()
        barrier("train_step_compiled")

    jsonl = JsonlLogger(args.output_dir)
    wandb_logger = WandbLogger(args) if args.log_wandb else None
    key = jax.random.PRNGKey(args.seed + 1)

    if args.profile:
        os.makedirs(os.path.join(args.output_dir, "profile"), exist_ok=True)
        jax.profiler.start_trace(os.path.join(args.output_dir, "profile"))

    tokens_seen = int(np.asarray(state.step)) * tokens_per_sample * global_batch
    eval_steps = None
    raw_batch, gbatch = first_batch, first_gbatch
    for epoch in range(start_epoch, args.epochs):
        logger = MetricLogger(print_freq=args.print_freq)
        # `gbatch` carries over from the previous epoch's prefetch overlap —
        # fetching a fresh one here would silently drop that batch
        for it, _ in logger.log_every(range(niter_per_ep),
                                      header=f"Epoch [{epoch}]",
                                      total=niter_per_ep):
            key, sub = jax.random.split(key)
            state, metrics = jstep(state, gbatch, sub)
            prev_batch = raw_batch
            raw_batch = next(loader_it)  # overlap host load with device step
            gbatch = global_batch_from_local(mesh, raw_batch)
            loss_val = float(metrics["loss"])
            if not np.isfinite(loss_val):
                # dump the offending batch and abort
                # (reference: run_training_egom2p.py:731-734)
                dump = os.path.join(args.output_dir, "debug_mod_dict.npz")
                os.makedirs(args.output_dir, exist_ok=True)
                flat = {f"{m}_{k}": np.asarray(v)
                        for m, d in prev_batch.items() for k, v in d.items()}
                np.savez(dump, **flat)
                print(f"Loss is {loss_val}, stopping training. Batch dumped "
                      f"to {dump}")
                raise SystemExit(1)
            logger.update(**{k: float(v) for k, v in metrics.items()})
            tokens_seen += tokens_per_sample * global_batch
            if wandb_logger:
                wandb_logger.log({**{k: float(v) for k, v in metrics.items()},
                                  "tokens_seen": tokens_seen},
                                 step=int(np.asarray(state.step)))
        if args.profile and epoch == start_epoch:
            jax.profiler.stop_trace()
            print(f"profile trace -> {args.output_dir}/profile")
            args.profile = False
        record = {"epoch": epoch, "tokens_seen_B": tokens_seen / 1e9,
                  **{k: v.global_avg for k, v in logger.meters.items()}}
        jsonl.write(record)
        if (epoch + 1) % args.save_ckpt_freq == 0 or epoch == args.epochs - 1:
            tag = epoch if epoch != args.epochs - 1 else "final"
            # periodic saves overlap the next epoch's steps (disk write on
            # a background thread); the final save blocks before exit
            blocking = epoch == args.epochs - 1 or not args.async_save
            path = save_checkpoint(args.output_dir, tag, state,
                                   blocking=blocking)
            print(f"saved{'' if blocking else ' (async)'} {path}")
            if args.s3_save_dir:
                from egom2p_tpu.core.distributed import is_main_process
                from egom2p_tpu.core.s3_sync import upload_after_save
                if is_main_process():
                    # async saves upload on a daemon thread after the orbax
                    # write commits; the loop keeps stepping
                    upload_after_save(path, args.s3_save_dir, blocking,
                                      endpoint_url=args.s3_endpoint)
        if args.eval_freq and (epoch + 1) % args.eval_freq == 0 and (
                val_factories or fixed_factories):
            from egom2p_tpu.core.distributed import all_reduce_metrics
            if eval_steps is None:
                # built once: rebuilding per epoch would recompile both
                # eval graphs every eval epoch
                from egom2p_tpu.train.egom2p_train import make_eval_step
                eval_steps = (
                    jax.jit(make_eval_step(
                        model, args.num_input_tokens, args.num_target_tokens,
                        args.loss_type)),
                    jax.jit(make_eval_step(
                        model, args.fixed_eval_input_tokens,
                        args.fixed_eval_target_tokens, args.loss_type)))
            eval_step, fixed_eval_step = eval_steps

            def run_eval(factory, step, prefix):
                accum, n = None, 0
                it = factory()
                for _ in range(args.eval_iters):
                    try:
                        eb = next(it)
                    except StopIteration:
                        break
                    # val streams are read un-split (identical on every
                    # host, global batch size) so hosts agree on the batch
                    # count; slice + assemble this host's rows
                    eb = global_batch_from_replicated(mesh, eb)
                    em = {k: float(v) for k, v in step(state.params,
                                                       eb).items()}
                    accum = em if accum is None else {
                        k: accum[k] + em[k] for k in em}
                    n += 1
                # EVERY host must enter the collective, even with zero local
                # batches (e.g. fewer val shards than hosts), or the others
                # deadlock in the psum.  Reducing (sums, count) computes the
                # correct globally-weighted mean.  The key set must be
                # host-independent, so it is derived from the model, not from
                # whatever batches this host happened to see.
                keys = ["loss"] + [f"loss_{m}"
                                   for m in sorted(model.out_domains)]
                reduced = all_reduce_metrics(
                    {**{f"{prefix}{k}": (accum or {}).get(k, 0.0)
                        for k in keys},
                     f"{prefix}__n": float(n)})
                n_tot = reduced.pop(f"{prefix}__n", 0.0)
                if n_tot <= 0:
                    return {}
                return {k: v / n_tot for k, v in reduced.items()}

            stats = {}
            for name, factory in val_factories.items():
                stats.update(run_eval(factory, eval_step, f"val_{name}_"))
            if args.fixed_eval:
                for name, factory in fixed_factories.items():
                    stats.update(run_eval(factory, fixed_eval_step,
                                          f"fixed_eval_{name}_"))
            if stats:
                print(f"Epoch [{epoch}] eval: " + "  ".join(
                    f"{k}: {v:.4f}" for k, v in stats.items()))
                jsonl.write({"epoch": epoch, **stats})
                if wandb_logger:
                    wandb_logger.log(stats, step=int(np.asarray(state.step)))
    from egom2p_tpu.core.checkpoint import wait_for_saves
    wait_for_saves()  # join any in-flight async periodic save before exit
    if args.s3_save_dir:
        from egom2p_tpu.core.s3_sync import wait_for_uploads
        wait_for_uploads()
    if wandb_logger:
        wandb_logger.finish()
    return state


def _warm_start(params, path, model):
    """Non-strict warm start: copy shape-matching leaves from a checkpoint.

    The reference additionally strips pos_emb keys before its non-strict
    load (run_training_egom2p.py:477-489) because its positional embeddings
    are registered buffers in the state dict; here the sincos tables are
    computed on the fly and never appear in the param tree, so shape-matching
    alone reproduces that behavior."""
    import jax
    from egom2p_tpu.core.checkpoint import load_checkpoint

    if path.endswith(".pth"):
        from egom2p_tpu.compat.torch_convert import load_egom2p_pth
        loaded = load_egom2p_pth(path, model)
    else:
        loaded = load_checkpoint(path)
        if isinstance(loaded, dict) and "opt_state" in loaded:
            loaded = loaded["params"]  # full TrainState -> flax variables

    flat_new = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_old = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    n_copied = 0
    out = {}
    for k, v in flat_new.items():
        if k in flat_old and flat_old[k].shape == v.shape:
            out[k] = flat_old[k]
            n_copied += 1
        else:
            out[k] = v
    print(f"warm start: copied {n_copied}/{len(flat_new)} tensors from {path}")
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, [out[k] for k, _ in
                                                  jax.tree_util.tree_flatten_with_path(params)[0]])


if __name__ == "__main__":
    main(get_args())

"""EgoM2P pretraining step: pjit-sharded, grad-accumulating.

TPU-native equivalent of the reference DDP train loop internals
(reference: run_training_egom2p.py:678-798):

  * DDP all-reduce becomes batch-axis sharding over the (replica, data) mesh;
    XLA inserts the gradient psum automatically under jit,
  * torch.cuda.amp autocast bf16 + GradScaler becomes fp32 params with bf16
    compute and no loss scaling,
  * gradient accumulation uses a lax.scan over microbatches inside one jit
    (the reference uses no_sync() between accumulation steps,
    run_training_egom2p.py:723),
  * per-step LR assignment from precomputed arrays becomes an optax schedule
    indexed by the step counter.
"""
from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from egom2p_tpu.core.mesh import BATCH_SPEC, REPLICATED_SPEC
from egom2p_tpu.models.egom2p import EgoM2P


class TrainState(NamedTuple):
    params: Any
    opt_state: optax.OptState
    step: jnp.ndarray


def init_train_state(params, optimizer) -> TrainState:
    return TrainState(params=params, opt_state=optimizer.init(params),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(model: EgoM2P, optimizer: optax.GradientTransformation,
                    num_input_tokens: int, num_target_tokens: int,
                    loss_type: str = "mod", accum_steps: int = 1):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    `batch` is a mod-dict pytree whose leaves have a leading
    (accum_steps * local_batch) dimension; sharded over the data axes by the
    caller (see shard_batch)."""

    def loss_fn(params, mod_dict, rng):
        loss, mod_loss = model.apply(
            params, mod_dict, num_input_tokens, num_target_tokens, loss_type,
            deterministic=False,
            rngs={"shuffle": rng, "dropout": jax.random.fold_in(rng, 1)})
        return loss, mod_loss

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def train_step(state: TrainState, batch: Dict, rng: jax.Array):
        if accum_steps == 1:
            (loss, mod_loss), grads = grad_fn(state.params, batch, rng)
        else:
            def micro(carry, inp):
                g_acc, l_acc, ml_acc = carry
                md, r = inp
                (l, ml), g = grad_fn(state.params, md, r)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                ml_acc = jax.tree_util.tree_map(jnp.add, ml_acc, ml)
                return (g_acc, l_acc + l, ml_acc), None

            # split leading dim into accum microbatches
            def split(x):
                return x.reshape(accum_steps, x.shape[0] // accum_steps,
                                 *x.shape[1:])

            micro_batches = jax.tree_util.tree_map(split, batch)
            rngs = jax.random.split(rng, accum_steps)
            zero_g = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            zero_ml = {m: jnp.zeros((), jnp.float32)
                       for m in sorted(model.out_domains)}
            (grads, loss, mod_loss), _ = jax.lax.scan(
                micro, (zero_g, jnp.zeros((), jnp.float32), zero_ml),
                (micro_batches, rngs))
            grads = jax.tree_util.tree_map(lambda g: g / accum_steps, grads)
            loss = loss / accum_steps
            mod_loss = jax.tree_util.tree_map(lambda l: l / accum_steps, mod_loss)

        gnorm = optax.global_norm(grads)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, opt_state=new_opt,
                               step=state.step + 1)
        metrics = {"loss": loss, "grad_norm": gnorm, **{
            f"loss_{m}": v for m, v in mod_loss.items()}}
        return new_state, metrics

    return train_step


def make_eval_step(model: EgoM2P, num_input_tokens: int,
                   num_target_tokens: int, loss_type: str = "mod"):
    """Deterministic eval loss (reference: run_training_egom2p.py:800-834)."""

    def eval_step(params, batch):
        loss, mod_loss = model.apply(
            params, batch, num_input_tokens, num_target_tokens, loss_type,
            deterministic=True)
        return {"loss": loss, **{f"loss_{m}": v for m, v in mod_loss.items()}}

    return eval_step


# ---------------------------------------------------------------- sharding
def fsdp_spec(shape, n_shard: int, min_size: int = 2 ** 16) -> P:
    """ZeRO/FSDP-style sharding rule for one parameter tensor: shard the
    largest dimension divisible by the data-axis size; small tensors stay
    replicated (their all-gather would cost more than it saves).

    The reference ships unused torch-FSDP plumbing (egom2p/utils/
    fsdp_utils.py:33-116); here parameter sharding is a pure sharding
    annotation — XLA's SPMD partitioner inserts the all-gathers for compute
    and keeps the persistent copy (params + optimizer moments) sharded."""
    import numpy as np
    if int(np.prod(shape)) < min_size:
        return REPLICATED_SPEC
    dims = sorted(range(len(shape)), key=lambda i: -shape[i])
    for d in dims:
        if shape[d] % n_shard == 0:
            spec = [None] * len(shape)
            spec[d] = "data"
            return P(*spec)
    return REPLICATED_SPEC


# column-parallel projections (output dim over 'model') and row-parallel
# reductions (input dim over 'model'), Megatron-style.  GSPMD keeps ANY
# choice semantically exact — these rules only decide where the collectives
# land; kernels are matched by the flax param-path suffix.
_TP_COLUMN = ("qkv", "q", "kv", "fc1", "fc3")
_TP_ROW = ("proj", "fc2")


def tp_spec(path, shape, n_shard: int) -> P:
    """Tensor-parallel sharding rule for one parameter (by path suffix).

    The reference has no tensor parallelism (SURVEY.md §2.5); this exceeds
    it with the standard TPU recipe: annotate shardings, let XLA insert the
    all-reduces over ICI.  Vocab-parallel token embeddings shard the 64k
    tables and (via weight tying) the logit heads — the CE logsumexp's psum
    over the vocab shards is inserted by the partitioner."""
    name = "/".join(str(getattr(p, "key", p)) for p in path)
    parts = name.split("/")
    leaf, mod = parts[-1], (parts[-2] if len(parts) > 1 else "")
    if leaf == "kernel":
        if mod in _TP_COLUMN and shape[-1] % n_shard == 0:
            return P(*([None] * (len(shape) - 1) + ["model"]))
        if mod in _TP_ROW and shape[0] % n_shard == 0:
            return P(*(["model"] + [None] * (len(shape) - 1)))
    elif leaf == "bias" and mod in _TP_COLUMN and shape[0] % n_shard == 0:
        return P("model")
    elif leaf == "token_emb" and shape[0] % n_shard == 0:
        return P("model", None)
    return REPLICATED_SPEC


def tp_param_shardings(mesh: Mesh, params, n_shard: int):
    """NamedSharding tree for a bare param pytree under tensor parallelism:
    tp_spec rule per array leaf, everything else replicated.  The single
    source of truth for TP param placement outside the optimizer state —
    used by the eval/serving CLIs and the sharding tests."""
    repl = NamedSharding(mesh, REPLICATED_SPEC)

    def leaf(path, x):
        if not getattr(x, "ndim", 0):
            return repl
        return NamedSharding(mesh, tp_spec(path, x.shape, n_shard))

    return jax.tree_util.tree_map_with_path(leaf, params)


def state_shardings(mesh: Mesh, state: TrainState,
                    fsdp: bool = False, tp: bool = False) -> TrainState:
    """Param/optimizer-state shardings.

    fsdp=False, tp=False: fully replicated (pure data parallelism — the
    only model-training parallelism the reference uses, SURVEY.md §2.5).
    fsdp=True : params AND optimizer moments sharded over the data axis by
    fsdp_spec; gradients reduce-scatter and weights all-gather implicitly.
    tp=True   : tensor parallelism over the 'model' mesh axis by tp_spec;
    params the rule leaves replicated fall back to fsdp_spec when fsdp is
    also set (TP x ZeRO).  Optimizer moments mirror the param tree inside
    the optax state, so the same path-suffix rules bind them too."""
    repl = NamedSharding(mesh, REPLICATED_SPEC)
    if not fsdp and not tp:
        return jax.tree_util.tree_map(lambda _: repl, state)
    n_data = mesh.shape["data"]
    n_model = mesh.shape["model"]

    def leaf_sharding(path, x):
        shape = getattr(x, "shape", ())
        if not shape:
            return repl
        if tp and n_model > 1:
            spec = tp_spec(path, shape, n_model)
            if spec != REPLICATED_SPEC:
                return NamedSharding(mesh, spec)
        if fsdp:
            return NamedSharding(mesh, fsdp_spec(shape, n_data))
        return repl

    return jax.tree_util.tree_map_with_path(leaf_sharding, state)


def batch_shardings(mesh: Mesh, batch: Dict) -> Dict:
    shard = NamedSharding(mesh, BATCH_SPEC)
    return jax.tree_util.tree_map(lambda _: shard, batch)


def jit_train_step(mesh: Mesh, train_step, state: TrainState, batch: Dict,
                   fsdp: bool = False, tp: bool = False):
    """Jit the step with explicit in/out shardings over the mesh.

    tp=True requires a mesh with model-axis size > 1; on real TPU also
    disable the Pallas flash path (ops/flash_attention.disable_flash) —
    GSPMD cannot partition a custom call, so TP attention runs on XLA's
    native fused attention instead."""
    st_sh = state_shardings(mesh, state, fsdp=fsdp, tp=tp)
    b_sh = batch_shardings(mesh, batch)
    repl = NamedSharding(mesh, REPLICATED_SPEC)
    # metric scalars replicated: every process can read them with float()
    # (None would let the partitioner leave them on one shard, which a
    # non-owning process cannot fetch in multi-process runs)
    metrics_sh = repl
    return jax.jit(
        train_step,
        in_shardings=(st_sh, b_sh, repl),
        out_shardings=(st_sh, metrics_sh),
        donate_argnums=(0,),
    )

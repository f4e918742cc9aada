"""EgoM2P: masked multimodal multitask encoder-decoder transformer, TPU-native.

Reimplements the reference model (reference: egom2p/models/egom2p_model.py:57-819)
as a flax.linen module built around fixed-shape mask-gather batching:

  * per-modality embeddings produce (x, emb) pairs,
  * the concatenated streams are reduced to exactly `num_encoder_tokens` /
    `num_decoder_tokens` by a deterministic argsort-gather
    (reference: egom2p_model.py:370-379) -- static shapes, XLA-friendly,
  * the decoder's per-modality / causal attention mask is rebuilt from the
    cumsum-compressed encoding (reference: egom2p_model.py:446-481),
  * losses are per-modality masked cross-entropies computed with a chunked
    (memory-bounded) logsumexp so the 64k-vocab heads never materialize
    (B, M, 64000) logits in HBM (the reference instead boolean-indexes on GPU,
    egom2p_model.py:633).

Differences by design (TPU idioms, not behavior changes):
  * the train-time modality-order shuffle (reference: egom2p_model.py:312) is
    realized as randomized per-modality tie-break offsets in the argsort
    priority, which is jit-compatible and produces the same distribution over
    gathered orderings,
  * modality embeddings are owned by this module and shared encoder/decoder
    explicitly (reference: egom2p_model.py:179-183).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from egom2p_tpu.data.modality_info import MODALITY_INFO
from egom2p_tpu.models.embeddings import make_decoder_embedding, make_encoder_embedding
from egom2p_tpu.models.transformer import Block, DecoderBlock, LayerNorm

SEQ_TYPES = ("seq", "seq_emb", "seq_token")


def _exclusive_cumsum(x):
    return jnp.concatenate([jnp.zeros_like(x[:1]), jnp.cumsum(x)[:-1]])


@dataclasses.dataclass(frozen=True)
class EgoM2PConfig:
    dim: int = 768
    encoder_depth: int = 12
    decoder_depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    mlp_bias: bool = True
    norm_bias: bool = True
    gated_mlp: bool = False
    qk_norm: bool = False
    act: str = "gelu"
    decoder_causal_mask: bool = False
    decoder_sep_mask: bool = True
    num_register_tokens: int = 0
    share_modality_embeddings: bool = True
    drop_path_rate_encoder: float = 0.0
    drop_path_rate_decoder: float = 0.0
    # rematerialize each block in the backward pass (reference flag:
    # egom2p_model.py:82).  With bf16 compute the base model fits batch 8
    # on a 16GB chip WITHOUT remat (+14% step throughput, measured); keep
    # it on for larger batches / longer budgets.
    use_act_checkpoint: bool = False
    # remat granularity when use_act_checkpoint: "full" recomputes the whole
    # block in backward (min HBM); "dots" saves matmul outputs and recomputes
    # only elementwise ops (jax.checkpoint_policies.dots_with_no_batch_dims_
    # saveable) — most of full-remat's HBM saving at a fraction of the
    # recompute FLOPs
    remat_policy: str = "full"
    # Matmul compute dtype (params always fp32).  bf16 is the MXU-native
    # rate and mirrors the reference's autocast-bf16 training
    # (reference: run_training_egom2p.py:725); norms/softmax/loss still
    # accumulate fp32.  Pass "float32" for exact-math parity tests.
    compute_dtype: str = "bfloat16"


class EgoM2P(nn.Module):
    config: EgoM2PConfig
    in_domains: Tuple[str, ...]
    out_domains: Tuple[str, ...]
    modality_info: Any = None  # defaults to the global MODALITY_INFO registry

    # ------------------------------------------------------------------ setup
    @property
    def mod_info(self):
        return self.modality_info if self.modality_info is not None else MODALITY_INFO

    @property
    def compute_dtype(self):
        return jnp.dtype(self.config.compute_dtype)

    def setup(self):
        cfg = self.config
        info = self.mod_info
        act = {"gelu": nn.gelu, "silu": nn.silu}[cfg.act]
        cdtype = self.compute_dtype

        self.encoder_embeddings = {
            mod: make_encoder_embedding(info[mod]["embed_spec"], cfg.dim,
                                        dtype=cdtype)
            for mod in sorted(self.in_domains)
        }
        self.decoder_embeddings = {
            mod: make_decoder_embedding(info[mod]["embed_spec"], cfg.dim)
            for mod in sorted(self.out_domains)
        }

        # Modality embeddings, shared encoder<->decoder for common modalities
        # (reference: egom2p_model.py:179-183).
        init = nn.initializers.normal(stddev=0.02)
        enc_set, dec_set = set(self.in_domains), set(self.out_domains)
        mod_emb = {}
        for mod in sorted(enc_set | dec_set):
            if mod in enc_set or cfg.share_modality_embeddings:
                mod_emb[mod] = self.param(f"mod_emb_{mod}", init, (1, 1, cfg.dim))
        self._mod_emb = mod_emb
        if not cfg.share_modality_embeddings:
            self._dec_mod_emb = {
                mod: self.param(f"dec_mod_emb_{mod}", init, (1, 1, cfg.dim))
                for mod in sorted(dec_set)
            }
        else:
            self._dec_mod_emb = mod_emb

        common_kwargs = dict(
            num_heads=cfg.num_heads, mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
            proj_bias=cfg.proj_bias, mlp_bias=cfg.mlp_bias, norm_bias=cfg.norm_bias,
            gated_mlp=cfg.gated_mlp, qk_norm=cfg.qk_norm, act=act, dtype=cdtype,
        )
        dpr_enc = np.linspace(0, cfg.drop_path_rate_encoder, cfg.encoder_depth)
        dpr_dec = np.linspace(0, cfg.drop_path_rate_decoder, cfg.decoder_depth)
        if cfg.use_act_checkpoint:
            # deterministic flag must stay static under remat
            policy = {"full": None,
                      "dots": jax.checkpoint_policies
                      .dots_with_no_batch_dims_saveable}[cfg.remat_policy]
            BlockCls = nn.remat(Block, static_argnums=(3,), policy=policy)
            DecBlockCls = nn.remat(DecoderBlock, static_argnums=(5,),
                                   policy=policy)
        else:
            BlockCls, DecBlockCls = Block, DecoderBlock
        self.encoder = [
            BlockCls(drop_path=float(dpr_enc[i]), name=f"encoder_{i}", **common_kwargs)
            for i in range(cfg.encoder_depth)
        ]
        self.encoder_norm = LayerNorm(use_bias=cfg.norm_bias, name="encoder_norm")
        self.decoder = [
            DecBlockCls(drop_path=float(dpr_dec[i]), name=f"decoder_{i}", **common_kwargs)
            for i in range(cfg.decoder_depth)
        ]
        self.decoder_norm = LayerNorm(use_bias=cfg.norm_bias, name="decoder_norm")
        self.decoder_proj_context = nn.Dense(cfg.dim, dtype=cdtype,
                                             name="decoder_proj_context")
        self.mask_token = self.param("mask_token", init, (1, 1, cfg.dim))
        if cfg.num_register_tokens > 0:
            self.register_tokens = self.param(
                "register_tokens", init, (1, cfg.num_register_tokens, cfg.dim))

    # ------------------------------------------------------- encoder masking
    def embed_encoder(self, mod_dict, compute_dtype=None):
        """Run per-modality encoder embeddings, in sorted modality order."""
        compute_dtype = compute_dtype or self.compute_dtype
        out = []
        for mod in sorted(self.in_domains):
            if mod not in mod_dict:
                continue
            x, emb = self.encoder_embeddings[mod](mod_dict[mod], self._mod_emb[mod], compute_dtype)
            out.append((mod, x, emb, mod_dict[mod]["input_mask"]))
        return out

    def forward_mask_encoder(self, enc_embeds, num_encoder_tokens: int):
        """Concat + deterministic argsort-gather to a fixed token count
        (reference: egom2p_model.py:344-396)."""
        info = self.mod_info
        tokens = jnp.concatenate([x for _, x, _, _ in enc_embeds], axis=1)
        emb = jnp.concatenate([e for _, _, e, _ in enc_embeds], axis=1)
        mask = jnp.concatenate([m for _, _, _, m in enc_embeds], axis=1)
        mod_ids = jnp.concatenate([
            jnp.full(x.shape[:2], info[mod]["id"], dtype=jnp.int32)
            for mod, x, _, _ in enc_embeds
        ], axis=1)

        B, O = mask.shape
        # epsilon tie-break keeps unmasked tokens first, in concat order
        prio = mask.astype(jnp.float32) + jnp.arange(O, dtype=jnp.float32)[None] * 1e-6
        ids_keep = jnp.argsort(prio, axis=1)[:, :num_encoder_tokens]

        def take(a):
            if a.ndim == 3:
                return jnp.take_along_axis(a, ids_keep[..., None], axis=1)
            return jnp.take_along_axis(a, ids_keep, axis=1)

        tokens_k, emb_k, mask_k, mod_k = take(tokens), take(emb), take(mask), take(mod_ids)
        tokens_k = jnp.where(mask_k[..., None], 0.0, tokens_k)
        emb_k = jnp.where(mask_k[..., None], 0.0, emb_k)
        mod_k = jnp.where(mask_k, -1, mod_k)

        if self.config.num_register_tokens > 0:
            reg = jnp.broadcast_to(
                self.register_tokens.astype(tokens_k.dtype),
                (B, self.config.num_register_tokens, tokens_k.shape[-1]))
            tokens_k = jnp.concatenate([reg, tokens_k], axis=1)
            emb_k = jnp.concatenate([jnp.zeros_like(reg), emb_k], axis=1)
            mask_k = jnp.concatenate(
                [jnp.zeros((B, reg.shape[1]), dtype=bool), mask_k], axis=1)
            mod_k = jnp.concatenate(
                [jnp.full((B, reg.shape[1]), -1, dtype=mod_k.dtype), mod_k], axis=1)

        encoder_mask = mask_k[:, None, :]  # (B, 1, N): True = blocked key
        return tokens_k, emb_k, encoder_mask, mod_k

    # ------------------------------------------------------- decoder masking
    def embed_decoder(self, mod_dict, compute_dtype=None):
        """Per-modality decoder embed + target assembly, in sorted order.

        Returns list of per-modality dicts with keys
        x / emb / mask / ids / attn / length, already seq-shifted
        (reference: egom2p_model.py:285-342)."""
        compute_dtype = compute_dtype or self.compute_dtype
        info = self.mod_info
        out = []
        for mod in sorted(self.out_domains):
            if mod not in mod_dict:
                continue
            d = mod_dict[mod]
            x, emb, ids = self.decoder_embeddings[mod].forward_embed(
                d, self._dec_mod_emb[mod], compute_dtype)
            if info[mod]["type"] in SEQ_TYPES:
                # next-token prediction: input shifted right, ids shifted left
                entry = dict(
                    mod=mod,
                    x=x[:, :-1],
                    emb=emb[:, :-1],
                    ids=ids[:, 1:],
                    mask=jnp.logical_or(d["target_mask"][:, 1:], d["target_mask"][:, :-1]),
                    attn=d["decoder_attention_mask"][:, :-1].astype(jnp.int32),
                )
            else:
                # image-type decoder inputs are replaced by the mask token
                mt = jnp.broadcast_to(self.mask_token.astype(x.dtype), x.shape)
                entry = dict(
                    mod=mod, x=mt, emb=emb, ids=ids,
                    mask=d["target_mask"],
                    attn=d["decoder_attention_mask"].astype(jnp.int32),
                )
            out.append(entry)
        return out

    def forward_mask_decoder(self, dec_embeds, num_decoder_tokens: int,
                             shuffle_rng: Optional[jax.Array] = None):
        """Concat (with optional random modality ordering via randomized
        tie-break offsets) + argsort-gather (reference: egom2p_model.py:398-444)."""
        info = self.mod_info
        lengths = np.array([e["x"].shape[1] for e in dec_embeds], dtype=np.int32)
        n_mods = len(dec_embeds)

        tokens = jnp.concatenate([e["x"] for e in dec_embeds], axis=1)
        emb = jnp.concatenate([e["emb"] for e in dec_embeds], axis=1)
        mask = jnp.concatenate([e["mask"] for e in dec_embeds], axis=1)
        ids = jnp.concatenate([e["ids"] for e in dec_embeds], axis=1)
        attn = jnp.concatenate([e["attn"] for e in dec_embeds], axis=1)
        mod_ids = jnp.concatenate([
            jnp.full(e["x"].shape[:2], info[e["mod"]]["id"], dtype=jnp.int32)
            for e in dec_embeds
        ], axis=1)

        B, P = mask.shape
        within = jnp.concatenate(
            [jnp.arange(l, dtype=jnp.float32) for l in lengths])[None]  # (1, P)
        if shuffle_rng is not None and n_mods > 1:
            # random modality order == random per-modality tie-break offsets
            # (equivalent to the reference's random.sample concat order,
            #  egom2p_model.py:312)
            perm = jax.random.permutation(shuffle_rng, n_mods)
            lens = jnp.asarray(lengths, dtype=jnp.float32)
            offs_in_perm = _exclusive_cumsum(lens[perm])
            rank = jnp.argsort(perm)
            offset_per_mod = offs_in_perm[rank]  # (n_mods,)
        else:
            offset_per_mod = jnp.asarray(
                _exclusive_cumsum(jnp.asarray(lengths, dtype=jnp.float32)))
        mod_index = jnp.concatenate([
            jnp.full((l,), i, dtype=jnp.int32) for i, l in enumerate(lengths)
        ])[None]
        base = offset_per_mod[mod_index]  # (1, P)
        prio = mask.astype(jnp.float32) + (base + within) * 1e-6
        ids_keep = jnp.argsort(prio, axis=1)[:, :num_decoder_tokens]

        def take(a):
            if a.ndim == 3:
                return jnp.take_along_axis(a, ids_keep[..., None], axis=1)
            return jnp.take_along_axis(a, ids_keep, axis=1)

        tokens_k, emb_k, mask_k = take(tokens), take(emb), take(mask)
        ids_k, attn_k, mod_k = take(ids), take(attn), take(mod_ids)

        tokens_k = jnp.where(mask_k[..., None], 0.0, tokens_k)
        emb_k = jnp.where(mask_k[..., None], 0.0, emb_k)
        ids_k = jnp.where(mask_k, 0, ids_k)
        all_img = all(info[e["mod"]]["type"] not in SEQ_TYPES for e in dec_embeds)
        mod_k = jnp.where(mask_k, -1, mod_k)
        if (not self.config.decoder_causal_mask and self.config.decoder_sep_mask
                and all_img):
            # For image-type modalities the cumsum + separation mask reduces
            # exactly to "attend within your own modality" -> flash-friendly
            # segment mask instead of a materialized (B, M, M) tensor.
            from egom2p_tpu.ops.attention import SegmentMask
            sa_mask = SegmentMask(segments=mod_k)
        else:
            sa_mask = self.adapt_decoder_attention_mask(attn_k, mod_k)
        decoder_mask = mask_k[:, None, :]
        return tokens_k, emb_k, decoder_mask, ids_k, sa_mask, mod_k

    def adapt_decoder_attention_mask(self, attn_compressed, mod_ids):
        """Cumsum-compressed -> full (B, M, M) boolean mask, True = blocked
        (reference: egom2p_model.py:446-481)."""
        B, M = attn_compressed.shape
        if self.config.decoder_causal_mask:
            blocked = jnp.triu(jnp.ones((M, M), dtype=bool), 1)[None]
            blocked = jnp.broadcast_to(blocked, (B, M, M))
        else:
            cums = jnp.cumsum(attn_compressed, axis=-1)  # (B, M)
            cols = jnp.arange(M, dtype=cums.dtype)[None, None, :]
            blocked = cols >= cums[:, :, None]
        if self.config.decoder_sep_mask:
            sep = mod_ids[:, None, :] != mod_ids[:, :, None]
            blocked = blocked | sep
        return blocked

    # ------------------------------------------------------------- backbones
    def forward_encoder(self, x, encoder_mask, deterministic=True):
        for blk in self.encoder:
            x = blk(x, encoder_mask, deterministic)
        return self.encoder_norm(x)

    def forward_decoder(self, y, context, encoder_mask, sa_mask, deterministic=True):
        for blk in self.decoder:
            y = blk(y, context, sa_mask, encoder_mask, deterministic)
        return self.decoder_norm(y)

    # ------------------------------------------------------------------ loss
    def _chunked_masked_ce(self, y, mod, target_ids, weights, chunk=2048):
        """Masked cross-entropy against modality `mod`'s output head.

        Computes sum(CE * w) and sum(w) with (chunk, V) logits tiles so the
        full (B*M, 64000) logits matrix never exists in HBM.

        EGOM2P_CE_SKIP=1 additionally skips chunks whose weights are all
        zero — rows belonging to OTHER modalities, roughly half of them for
        each 64k video head — via lax.cond (their contribution and
        gradients are exactly zero either way).  Off by default: the cond
        makes the SPMD partitioner re-materialize captured activations
        around the branch (compile warnings on the mesh legs), so it must
        earn its keep in a measured A/B before becoming the default.
        EGOM2P_CE_CHUNK overrides the tile size: smaller tiles skip a
        larger fraction of the off-modality spans at the cost of more scan
        iterations.
        """
        import os
        emb_mod = self.decoder_embeddings[mod]
        chunk = int(os.environ.get("EGOM2P_CE_CHUNK", "0")) or chunk
        skip = os.environ.get("EGOM2P_CE_SKIP", "0") == "1"
        D = y.shape[-1]
        yf = y.reshape(-1, D)
        w = weights.reshape(-1).astype(jnp.float32)
        # zero out targets from other modalities: they can exceed this head's
        # vocab (e.g. 64k video ids vs a 256 cam head) and would hit the
        # out-of-bounds NaN fill of take_along_axis
        t = jnp.where(weights.reshape(-1), target_ids.reshape(-1), 0)

        # Large-vocab heads route to the Pallas flash-CE forward (online
        # vocab-tiled logsumexp — the (chunk, 64k) fp32 logits tile never
        # round-trips HBM); its custom_vjp backward is the same chunked
        # XLA recompute as the scan below.  EGOM2P_FLASH_CE=0 reverts.
        #
        # Gated on CE's OWN probe (flash_ce_available), never the attention
        # routing probes supports_flash()/flash_backend_available(): tests
        # monkeypatch those to force flash64 attention routing on CPU, and
        # CE must not piggyback (a non-interpret pallas_call would crash
        # on the CPU backend — the round-4 red-tier regression).
        flash_env = os.environ.get("EGOM2P_FLASH_CE", "1")
        vocab = self.mod_info[mod]["vocab_size"]
        if (flash_env != "0" and not skip and vocab >= 4096
                and D % 128 == 0):
            from egom2p_tpu.ops.flash_ce import flash_ce_available
            interp = flash_env == "interpret"  # test hook (CPU backends)
            if interp or flash_ce_available():
                w_mat = (emb_mod.token_emb if emb_mod.share_embedding
                         else emb_mod.to_logits)
                from egom2p_tpu.ops.flash_ce import flash_ce_total
                total = flash_ce_total(yf, w_mat, t, w, chunk=chunk,
                                       interpret=interp)
                return total, jnp.sum(w)
        n = yf.shape[0]
        pad = (-n) % chunk
        if pad:
            yf = jnp.pad(yf, ((0, pad), (0, 0)))
            t = jnp.pad(t, (0, pad))
            w = jnp.pad(w, (0, pad))
        yc = yf.reshape(-1, chunk, D)
        tc = t.reshape(-1, chunk)
        wc = w.reshape(-1, chunk)

        @jax.checkpoint
        def body(carry, inp):
            y_c, t_c, w_c = inp

            def live(_):
                logits = emb_mod.forward_logits(y_c)  # (chunk, V) fp32
                logz = jax.nn.logsumexp(logits, axis=-1)
                gold = jnp.take_along_axis(logits, t_c[:, None], axis=-1)[:, 0]
                return jnp.sum((logz - gold) * w_c)

            if skip:
                contrib = jax.lax.cond(jnp.any(w_c > 0), live,
                                       lambda _: jnp.zeros((), jnp.float32),
                                       None)
            else:
                contrib = live(None)
            return carry + contrib, None

        total, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (yc, tc, wc))
        return total, jnp.sum(w)

    def forward_loss(self, y, target_ids, decoder_mod_mask, loss_type: str,
                     present_mods: List[str]):
        """'mod' / 'weighted_mod' / 'token' losses
        (reference: egom2p_model.py:553-680)."""
        info = self.mod_info
        mod_loss: Dict[str, jnp.ndarray] = {}
        mod_count: Dict[str, jnp.ndarray] = {}
        for mod in present_mods:
            w = (decoder_mod_mask == info[mod]["id"])
            total, count = self._chunked_masked_ce(y, mod, target_ids, w)
            loss_m = jnp.where(count > 0, total / jnp.maximum(count, 1.0), 0.0)
            if loss_type == "weighted_mod":
                # rescale as if every modality had a 256-entry codebook
                # (reference: egom2p_model.py:608)
                loss_m = loss_m / np.log(info[mod]["vocab_size"]) * np.log(256.0)
            mod_loss[mod] = loss_m
            mod_count[mod] = count

        if loss_type in ("mod", "modality", "weighted_mod"):
            loss = sum(mod_loss.values()) / len(mod_loss)
        elif loss_type == "token":
            # NOTE: the reference weights modalities by logits.numel() =
            # n_tokens * vocab_size (egom2p_model.py:676); replicated here.
            weights = {m: mod_count[m] * info[m]["vocab_size"] for m in mod_loss}
            denom = jnp.maximum(sum(weights.values()), 1.0)
            loss = sum(mod_loss[m] * weights[m] for m in mod_loss) / denom
        else:
            raise ValueError(f"Invalid loss type: {loss_type}")
        return loss, mod_loss

    # --------------------------------------------------------------- forward
    def __call__(self, mod_dict, num_encoder_tokens: int, num_decoder_tokens: int,
                 loss_type: str = "mod", return_logits: bool = False,
                 deterministic: bool = True, compute_dtype=None):
        """Training forward (reference: egom2p_model.py:683-734)."""
        compute_dtype = compute_dtype or self.compute_dtype
        enc_embeds = self.embed_encoder(mod_dict, compute_dtype)
        encoder_tokens, encoder_emb, encoder_mask, _ = self.forward_mask_encoder(
            enc_embeds, num_encoder_tokens)

        dec_embeds = self.embed_decoder(mod_dict, compute_dtype)
        shuffle_rng = None
        if not deterministic and self.has_rng("shuffle"):
            shuffle_rng = self.make_rng("shuffle")
        decoder_tokens, decoder_emb, decoder_mask, target_ids, sa_mask, dec_mod_mask = \
            self.forward_mask_decoder(dec_embeds, num_decoder_tokens, shuffle_rng)

        x = encoder_tokens + encoder_emb
        x = self.forward_encoder(x, encoder_mask, deterministic)

        context = self.decoder_proj_context(x) + encoder_emb
        y = decoder_tokens + decoder_emb
        y = self.forward_decoder(y, context, encoder_mask, sa_mask, deterministic)

        present = [e["mod"] for e in dec_embeds]
        if return_logits:
            return {
                mod: self.decoder_embeddings[mod].forward_logits(y)
                for mod in present
            }
        return self.forward_loss(y, target_ids, dec_mod_mask, loss_type, present)

    # ------------------------------------------------------ generation hooks
    def forward_enc_context(self, mod_dict, num_encoder_tokens: int,
                            compute_dtype=None):
        """Encoder pass + context projection, for the generation sampler."""
        compute_dtype = compute_dtype or self.compute_dtype
        enc_embeds = self.embed_encoder(mod_dict, compute_dtype)
        encoder_tokens, encoder_emb, encoder_mask, _ = self.forward_mask_encoder(
            enc_embeds, num_encoder_tokens)
        x = self.forward_encoder(encoder_tokens + encoder_emb, encoder_mask)
        context = self.decoder_proj_context(x) + encoder_emb
        return context, encoder_mask

    def forward_dec_subset_hidden(self, mod_dict, target_mod: str, context,
                                  encoder_mask, ids_keep,
                                  compute_dtype=None):
        """Decoder pass over a selected subset of still-masked target
        positions, stopping at the hidden states (before the vocab head);
        used by ROAR/MaskGIT steps
        (reference: egom2p/models/generate.py:630-650, 747-766)."""
        compute_dtype = compute_dtype or self.compute_dtype
        d = mod_dict[target_mod]
        _, emb, _ = self.decoder_embeddings[target_mod].forward_embed(
            d, self._dec_mod_emb[target_mod], compute_dtype)
        dec_emb = jnp.take_along_axis(emb, ids_keep[..., None], axis=1)
        mt = jnp.broadcast_to(
            self.mask_token.astype(dec_emb.dtype),
            (dec_emb.shape[0], ids_keep.shape[1], dec_emb.shape[-1]))
        y = mt + dec_emb
        return self.forward_decoder(y, context, encoder_mask, None)

    def forward_mod_logits(self, target_mod: str, y):
        """Vocab head of one modality over decoder hidden states.

        Kept separate from `forward_dec_subset_hidden` so the sampler can
        apply it to position chunks: materializing the full (B, k, 64000)
        fp32 logits at once costs gigabytes of HBM and forces XLA into
        compressed remat copies."""
        return self.decoder_embeddings[target_mod].forward_logits(y)

    def forward_dec_subset_logits(self, mod_dict, target_mod: str, context,
                                  encoder_mask, ids_keep,
                                  compute_dtype=None):
        """Decoder subset pass incl. the vocab head (full logits — prefer the
        hidden/chunked pair above at generation time)."""
        compute_dtype = compute_dtype or self.compute_dtype
        y = self.forward_dec_subset_hidden(mod_dict, target_mod, context,
                                           encoder_mask, ids_keep,
                                           compute_dtype)
        return self.decoder_embeddings[target_mod].forward_logits(y)

    def forward_dec_autoregressive_logits(self, target_mod: str, out_ids, pos_emb,
                                          context, encoder_mask,
                                          compute_dtype=None):
        """One full re-forward of the causal decoder over the current output
        prefix (reference: generate.py:892-903)."""
        compute_dtype = compute_dtype or self.compute_dtype
        emb_mod = self.decoder_embeddings[target_mod]
        x = jnp.take(emb_mod.token_emb, out_ids, axis=0).astype(compute_dtype)
        cur = out_ids.shape[1]
        y = x + pos_emb[:, :cur]
        causal = jnp.triu(jnp.ones((cur, cur), dtype=bool), 1)[None]
        y = self.forward_decoder(y, context, encoder_mask, causal)
        return emb_mod.forward_logits(y)


# ----------------------------------------------------------------- registry
def _cfg(depth, dim, heads, **kw):
    return dict(encoder_depth=depth, decoder_depth=depth, dim=dim, num_heads=heads, **kw)


_GELU = dict(mlp_ratio=4.0, qkv_bias=True, act="gelu")
_SWIGLU = dict(mlp_ratio=4.0, qkv_bias=False, proj_bias=False, mlp_bias=False,
               norm_bias=False, act="silu", gated_mlp=True)

# (reference: egom2p_model.py:882-1196)
MODEL_REGISTRY: Dict[str, Dict[str, Any]] = {
    "egom2p_tiny_6e_6d_gelu": _cfg(6, 384, 6, **_GELU),
    "egom2p_small_8e_8d_gelu": _cfg(8, 512, 8, **_GELU),
    "egom2p_base_12e_12d_gelu": _cfg(12, 768, 12, **_GELU),
    "egom2p_large_24e_24d_gelu": _cfg(24, 1024, 16, **_GELU),
    "egom2p_xlarge_24e_24d_gelu": _cfg(24, 2048, 32, **_GELU),
    "egom2p_tiny_6e_6d_swiglu_nobias": _cfg(6, 384, 6, **_SWIGLU),
    "egom2p_small_8e_8d_swiglu_nobias": _cfg(8, 512, 8, **_SWIGLU),
    "egom2p_base_12e_12d_swiglu_nobias": _cfg(12, 768, 12, **_SWIGLU),
    "egom2p_base_12e_12d_swiglu_nobias_causal": _cfg(
        12, 768, 12, decoder_causal_mask=True, **_SWIGLU),
    "egom2p_large_24e_24d_swiglu_nobias": _cfg(24, 1020, 15, **_SWIGLU),
    "egom2p_xlarge_24e_24d_swiglu_nobias": _cfg(24, 2046, 31, **_SWIGLU),
    "egom2p_base_12e_12d_swiglu_qknorm_nobias": _cfg(12, 768, 12, qk_norm=True, **_SWIGLU),
    "egom2p_large_24e_24d_swiglu_qknorm_nobias": _cfg(24, 1024, 16, qk_norm=True, **_SWIGLU),
    "egom2p_xlarge_24e_24d_swiglu_qknorm_nobias": _cfg(24, 2048, 32, qk_norm=True, **_SWIGLU),
}


def create_model(name: str, in_domains, out_domains, modality_info=None,
                 num_register_tokens: int = 0, **overrides) -> EgoM2P:
    """Model factory matching the reference registry names
    (reference: egom2p/utils/timm/model_builder.py:27)."""
    if name not in MODEL_REGISTRY:
        raise ValueError(f"Unknown model {name}; available: {list(MODEL_REGISTRY)}")
    kw = dict(MODEL_REGISTRY[name])
    kw["num_register_tokens"] = num_register_tokens
    kw.update(overrides)
    cfg = EgoM2PConfig(**kw)
    return EgoM2P(config=cfg, in_domains=tuple(in_domains),
                  out_domains=tuple(out_domains), modality_info=modality_info)

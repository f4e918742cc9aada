"""Unified Dirichlet-budget masking: the pretraining objective.

Host-side numpy reimplementation of the reference UnifiedMasking /
TransferMasking (reference: egom2p/data/masking.py:131-746): samples
per-modality input/target token budgets from a mixture of Dirichlet
distributions (clamp + retry to respect min/max token constraints), then masks
each modality:

  * img/cam/gaze: random-permutation keep-k with the cumsum-compressed decoder
    attention encoding (first kept target position carries the budget,
    reference: masking.py:236-266),
  * seq/seq_token: sentinel span masking with keep-probability decay until the
    input fits the budget (reference: masking.py:268-445).

Runs in the input pipeline on CPU; every output tensor has a fixed
per-modality shape so the jitted train step never retraces.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from egom2p_tpu.masking.span import (chunk_span_masking,
                                     get_sentinel_to_id_mapping,
                                     simple_span_masking)

IMG_TYPES = ("img", "cam", "gaze", "keypoints")


def _to2tuple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v)


class UnifiedMasking:
    def __init__(self,
                 modality_info: Dict,
                 text_tokenizer=None,
                 input_tokens_range: Union[int, Tuple[int, int]] = 2048,
                 target_tokens_range: Optional[Union[int, Tuple[int, int]]] = 2048,
                 max_tries: int = 100,
                 sampling_weights: Optional[List[float]] = None,
                 seed: Optional[int] = None):
        self.input_tokens_range = _to2tuple(input_tokens_range)
        self.target_tokens_range = (_to2tuple(target_tokens_range)
                                    if target_tokens_range is not None else None)
        self.modality_info = modality_info
        self.mod_names = list(modality_info.keys())
        self.num_modalities = len(modality_info)
        self.max_tries = max_tries
        self.min_tokens = np.array([m["min_tokens"] for m in modality_info.values()])
        self.max_tokens = np.array([m["max_tokens"] for m in modality_info.values()])
        self.mod_is_not_seq = np.array(
            [m["type"] in IMG_TYPES for m in modality_info.values()])

        eps = 1e-9
        input_alphas = np.array([m["input_alphas"] for m in modality_info.values()])
        target_alphas = np.array([m["target_alphas"] for m in modality_info.values()])
        # (nmod, nmix) -> (nmix, nmod)
        self.input_alphas = np.clip(input_alphas.T, eps, None)
        self.target_alphas = np.clip(target_alphas.T, eps, None)
        assert self.input_alphas.shape == self.target_alphas.shape
        self.num_dirichlets = self.input_alphas.shape[0]
        self.sampling_weights = (np.asarray(sampling_weights, dtype=np.float64)
                                 if sampling_weights is not None else None)

        self.rng = np.random.default_rng(seed)
        self.text_tokenizer = text_tokenizer
        self.keep_prob_decay_factor = 0.9
        if text_tokenizer is not None:
            self.sentinel_to_id = get_sentinel_to_id_mapping(text_tokenizer)
            self.sentinel_ids = set(self.sentinel_to_id.values())
            self.pad_id = text_tokenizer.token_to_id("[PAD]")
            self.eos_id = text_tokenizer.token_to_id("[EOS]")
        else:
            # text-free configs (the released 4-modality model) need no tokenizer
            assert all(m["type"] in IMG_TYPES for m in modality_info.values()), \
                "sequence modalities require a text_tokenizer"

    # -------------------------------------------------------------- budgets
    def _dirichlet(self, alphas: np.ndarray) -> np.ndarray:
        return self.rng.dirichlet(alphas)

    def input_token_budget(self, num_input_tokens: int, dir_idx: int) -> List[int]:
        """(reference: masking.py:181-205)"""
        alphas = self.input_alphas[dir_idx]
        for _ in range(self.max_tries):
            budget = np.floor(self._dirichlet(alphas) * num_input_tokens).astype(int)
            diff = num_input_tokens - budget.sum()
            if diff > 0:
                # assign remaining by argmax of fresh Dirichlet draws so
                # near-zero-alpha modalities stay empty
                draws = self.rng.dirichlet(alphas, size=diff)
                budget += np.bincount(draws.argmax(-1), minlength=len(budget))
            budget = np.minimum(budget, self.max_tokens)
            if (budget >= self.min_tokens).all():
                return budget.tolist()
        return budget.tolist()

    def target_token_budget(self, input_token_budget: List[int],
                            num_target_tokens: int, dir_idx: int) -> List[int]:
        """(reference: masking.py:207-234)"""
        max_remaining = np.where(self.mod_is_not_seq,
                                 self.max_tokens - np.asarray(input_token_budget),
                                 self.max_tokens)
        max_remaining = np.maximum(self.min_tokens, max_remaining)
        alphas = self.target_alphas[dir_idx]
        for _ in range(self.max_tries):
            budget = np.floor(self._dirichlet(alphas) * num_target_tokens).astype(int)
            diff = num_target_tokens - budget.sum()
            if diff > 0:
                draws = self.rng.dirichlet(alphas, size=diff)
                budget += np.bincount(draws.argmax(-1), minlength=len(budget))
            budget = np.minimum(budget, max_remaining)
            if (budget >= self.min_tokens).all():
                return budget.tolist()
        return budget.tolist()

    # -------------------------------------------------------------- masking
    def image_mask(self, tensor: np.ndarray, num_tokens: int,
                   input_budget: int, target_budget: Optional[int]) -> Dict:
        """(reference: masking.py:236-266)"""
        ids_shuffle = self.rng.permutation(num_tokens)

        input_mask = np.ones(num_tokens, dtype=bool)
        input_mask[:input_budget] = False
        input_mask = input_mask[ids_shuffle]

        if target_budget is None:
            target_mask = ~input_mask
        else:
            target_mask = np.ones(num_tokens, dtype=bool)
            target_mask[input_budget:input_budget + target_budget] = False
            target_mask = target_mask[ids_shuffle]

        attn = np.zeros(num_tokens, dtype=np.int32)
        unmasked = np.where(~target_mask)[0]
        if len(unmasked):
            attn[unmasked[0]] = len(unmasked)
        return {"tensor": np.asarray(tensor), "input_mask": input_mask,
                "target_mask": target_mask, "decoder_attention_mask": attn}

    def _span_budgeted(self, seq_ids, input_budget, target_budget, keep_scheme,
                       span_fn):
        """Shared span-mask + budget-fitting logic
        (reference: masking.py:287-341)."""
        if input_budget == 0:
            keep_prob = 0.0
            input_seq: List[int] = []
            _, target_seq = span_fn(seq_ids, self.sentinel_to_id, keep_prob, self.rng)
        else:
            if keep_scheme == "random":
                keep_prob = self.rng.uniform(0, 1)
            elif keep_scheme == "all":
                keep_prob = 1.0
            elif keep_scheme == "binary":
                keep_prob = float(self.rng.integers(0, 2))
            else:
                raise ValueError(keep_scheme)
            input_seq, target_seq = span_fn(seq_ids, self.sentinel_to_id,
                                            keep_prob, self.rng)
            while len(input_seq) > input_budget:
                keep_prob *= self.keep_prob_decay_factor
                input_seq, target_seq = span_fn(seq_ids, self.sentinel_to_id,
                                                keep_prob, self.rng)

        if target_budget is not None and len(target_seq) > target_budget:
            sentinel_idx = [i for i, t in enumerate(target_seq)
                            if t in self.sentinel_ids]
            chosen = self.rng.integers(0, max(1, len(sentinel_idx) - 1))
            if len(target_seq) - sentinel_idx[chosen] >= target_budget:
                s = sentinel_idx[chosen]
                target_seq = target_seq[s:s + target_budget]
            else:
                for idx in sentinel_idx:
                    if len(target_seq) - idx <= target_budget:
                        target_seq = target_seq[idx:]
                        break
        return input_seq, target_seq

    def _pack_seq(self, input_seq, target_seq, max_tokens, input_budget):
        max_length = (max_tokens + 1) * 2
        tensor = np.full(max_length, self.pad_id, dtype=np.int32)
        input_mask = np.ones(max_length, dtype=bool)
        target_mask = np.ones(max_length, dtype=bool)
        attn = np.zeros(max_length, dtype=np.int32)
        tensor[: len(input_seq)] = input_seq
        input_mask[: len(input_seq)] = False
        tensor[input_budget: input_budget + len(target_seq)] = target_seq
        target_mask[input_budget: input_budget + len(target_seq)] = False
        attn[input_budget: input_budget + len(target_seq)] = 1
        return {"tensor": tensor, "input_mask": input_mask,
                "target_mask": target_mask, "decoder_attention_mask": attn}

    def sequence_mask(self, sequence, max_tokens, input_budget, target_budget,
                      keep_scheme) -> Dict:
        """(reference: masking.py:345-445)"""
        if isinstance(sequence, str):
            seq_ids = self.text_tokenizer.encode(sequence).ids
            seq_ids.append(self.eos_id)
            seq_ids = seq_ids[:max_tokens]
            span_fn = simple_span_masking
        elif isinstance(sequence, list):
            encoded = self.text_tokenizer.encode_batch(sequence)
            seq_ids = [s.ids for s in encoded]
            seq_ids.append([self.eos_id])
            cum = np.cumsum([len(c) for c in seq_ids])
            seq_ids = [c for c, n in zip(seq_ids, cum) if n <= max_tokens]
            span_fn = chunk_span_masking
        else:
            raise ValueError(type(sequence))
        input_seq, target_seq = self._span_budgeted(
            seq_ids, input_budget, target_budget, keep_scheme, span_fn)
        return self._pack_seq(input_seq, target_seq, max_tokens, input_budget)

    def sequence_token_mask(self, sequence_ids, max_tokens, input_budget,
                            target_budget, keep_scheme, vocab_offset) -> Dict:
        """Pre-tokenized sequences, e.g. global feature tokens
        (reference: masking.py:268-343)."""
        seq_ids = [int(t) + vocab_offset for t in sequence_ids]
        input_seq, target_seq = self._span_budgeted(
            seq_ids, input_budget, target_budget, keep_scheme,
            simple_span_masking)
        return self._pack_seq(input_seq, target_seq, max_tokens, input_budget)

    def sequence_emb_mask_span(self, emb_tensor, max_tokens, input_budget,
                               target_budget, keep_scheme) -> Dict:
        """Span-mask a precomputed sequence-embedding tensor (T5/CLIP
        embeddings).  Input-only — target masking is not supported for
        sequence embeddings (reference: masking.py:448-518)."""
        emb_tensor = np.asarray(emb_tensor, dtype=np.float32)
        # fake token ids that dodge the sentinel range so the shared span
        # machinery applies (reference: masking.py:463-474)
        fake_ids: List[int] = []
        emb_by_id = {}
        id_num = len(self.sentinel_ids)
        i = 0
        while len(fake_ids) < len(emb_tensor):
            if id_num not in self.sentinel_ids:
                fake_ids.append(id_num)
                emb_by_id[id_num] = emb_tensor[i]
                i += 1
            id_num += 1
        fake_ids = fake_ids[:max_tokens]
        input_seq, _ = self._span_budgeted(fake_ids, input_budget, None,
                                           keep_scheme, simple_span_masking)
        E = emb_tensor.shape[1]
        tensor = np.zeros((max_tokens, E), dtype=np.float32)
        input_mask = np.ones(max_tokens, dtype=bool)
        target_mask = np.ones(max_tokens, dtype=bool)
        attn = np.zeros(max_tokens, dtype=np.int32)
        for j, fid in enumerate(input_seq):
            if fid not in self.sentinel_ids:
                tensor[j] = emb_by_id[fid]
            # sentinel slots stay zero (reference: masking.py:509-511)
        input_mask[: len(input_seq)] = False
        return {"tensor": tensor, "input_mask": input_mask,
                "target_mask": target_mask, "decoder_attention_mask": attn}

    # -------------------------------------------------------------- __call__
    def __call__(self, mod_dict: Dict) -> Dict:
        """(reference: masking.py:519-564)"""
        if self.sampling_weights is not None:
            p = self.sampling_weights / self.sampling_weights.sum()
            dir_idx = int(self.rng.choice(self.num_dirichlets, p=p))
        else:
            dir_idx = int(self.rng.integers(0, self.num_dirichlets))

        n_in = int(self.rng.integers(self.input_tokens_range[0],
                                     self.input_tokens_range[1] + 1))
        input_budget = self.input_token_budget(n_in, dir_idx)
        if self.target_tokens_range is not None:
            n_tgt = int(self.rng.integers(self.target_tokens_range[0],
                                          self.target_tokens_range[1] + 1))
            target_budget = self.target_token_budget(input_budget, n_tgt, dir_idx)
        else:
            target_budget = [None] * self.num_modalities

        out = {}
        for (mod, info), bi, bt in zip(self.modality_info.items(),
                                       input_budget, target_budget):
            mtype = info["type"]
            if mtype in IMG_TYPES:
                out[mod] = self.image_mask(mod_dict[mod], info["max_tokens"],
                                           bi, bt)
            elif mtype == "seq":
                keep = info["keep"][dir_idx] if "keep" in info else "random"
                out[mod] = self.sequence_mask(mod_dict[mod], info["max_tokens"],
                                              bi, bt, keep)
            elif mtype == "seq_token":
                keep = info["keep"][dir_idx] if "keep" in info else "random"
                out[mod] = self.sequence_token_mask(
                    mod_dict[mod], info["max_tokens"], bi, bt, keep,
                    info.get("vocab_offset", 0))
            elif mtype == "seq_emb":
                keep = info["keep"][dir_idx] if "keep" in info else "random"
                out[mod] = self.sequence_emb_mask_span(
                    mod_dict[mod], info["max_tokens"], bi, bt, keep)
            else:
                raise ValueError(f"invalid modality type {mtype}")
        return out


class TransferMasking:
    """Fixed input/target modality assignment for finetuning
    (reference: masking.py:567-746)."""

    def __init__(self, modality_info: Dict, text_tokenizer,
                 input_modalities: List[str], target_modalities: List[str]):
        self.modality_info = modality_info
        self.input_modalities = set(input_modalities)
        self.target_modalities = set(target_modalities)
        self.text_tokenizer = text_tokenizer
        if text_tokenizer is not None:
            self.sentinel_to_id = get_sentinel_to_id_mapping(text_tokenizer)
            self.sentinel_ids = set(self.sentinel_to_id.values())
            self.pad_id = text_tokenizer.token_to_id("[PAD]")
            self.eos_id = text_tokenizer.token_to_id("[EOS]")

    def input_image(self, tensor, num_tokens):
        return {"tensor": np.asarray(tensor),
                "input_mask": np.zeros(num_tokens, dtype=bool),
                "target_mask": np.ones(num_tokens, dtype=bool),
                "decoder_attention_mask": np.zeros(num_tokens, dtype=np.int32)}

    def target_image(self, tensor, num_tokens):
        attn = np.zeros(num_tokens, dtype=np.int32)
        attn[0] = num_tokens
        return {"tensor": np.asarray(tensor),
                "input_mask": np.ones(num_tokens, dtype=bool),
                "target_mask": np.zeros(num_tokens, dtype=bool),
                "decoder_attention_mask": attn}

    def _sequence(self, sequence_str: str, max_tokens: int, as_input: bool):
        """Span-pack a text sequence fully as input (keep_prob=1) or fully as
        target (keep_prob=0) (reference: masking.py:644-727)."""
        if self.text_tokenizer is None:
            raise ValueError(
                "TransferMasking with sequence modalities needs a text "
                "tokenizer (pass text_tokenizer=...)")
        seq_ids = list(self.text_tokenizer.encode(sequence_str).ids)
        seq_ids.append(self.eos_id)
        seq_ids = seq_ids[:max_tokens]
        rng = np.random.default_rng(0)  # keep_prob 1/0 is deterministic
        if as_input:
            input_ids, target_ids = simple_span_masking(
                seq_ids, self.sentinel_to_id, 1.0, rng)
        else:
            input_ids = []
            _, target_ids = simple_span_masking(
                seq_ids, self.sentinel_to_id, 0.0, rng)
        max_length = (max_tokens + 1) * 2
        tensor = np.full(max_length, self.pad_id, dtype=np.int32)
        input_mask = np.ones(max_length, dtype=bool)
        target_mask = np.ones(max_length, dtype=bool)
        attn = np.zeros(max_length, dtype=np.int32)
        tensor[:len(input_ids)] = input_ids
        input_mask[:len(input_ids)] = False
        tensor[max_tokens:max_tokens + len(target_ids)] = target_ids
        target_mask[max_tokens:max_tokens + len(target_ids)] = False
        attn[max_tokens:max_tokens + len(target_ids)] = 1
        return {"tensor": tensor, "input_mask": input_mask,
                "target_mask": target_mask, "decoder_attention_mask": attn}

    def __call__(self, mod_dict):
        out = {}
        for mod, info in self.modality_info.items():
            is_input = mod in self.input_modalities
            is_target = mod in self.target_modalities
            if not (is_input or is_target):
                raise ValueError(f"modality {mod} not in input or target set")
            if info["type"] in IMG_TYPES:
                fn = self.input_image if is_input else self.target_image
                out[mod] = fn(mod_dict[mod], info["max_tokens"])
            elif info["type"] == "seq":
                out[mod] = self._sequence(mod_dict[mod], info["max_tokens"],
                                          as_input=is_input)
            else:
                raise ValueError(
                    f"TransferMasking does not support type "
                    f"{info['type']!r} ({mod}) — matches the reference, "
                    f"masking.py:739-744")
        if "mask_valid" in mod_dict:
            out["mask_valid"] = mod_dict["mask_valid"]
        return out

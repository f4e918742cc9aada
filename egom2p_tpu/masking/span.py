"""T5-style sentinel span masking for sequence modalities.

Host-side (pure Python) utilities matching the reference
(reference: egom2p/data/masking.py:58-127,
egom2p/utils/tokenizer/text_tokenizer.py:110-140).
"""
from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

import numpy as np


def simple_span_masking(sequence: Sequence[int], sentinel_to_id: Dict[int, int],
                        keep_prob: float,
                        rng: np.random.Generator) -> Tuple[List[int], List[int]]:
    """(reference: masking.py:58-91)"""
    masks = rng.random(len(sequence)) > keep_prob
    input_seq: List[int] = []
    target_seq: List[int] = []
    prev_mask = False
    sentinel_count = 0
    for token, mask in zip(sequence, masks):
        if mask:
            if not prev_mask:
                sentinel_count += 1
                input_seq.append(sentinel_to_id[sentinel_count])
                target_seq.append(sentinel_to_id[sentinel_count])
            prev_mask = True
            target_seq.append(int(token))
        else:
            prev_mask = False
            input_seq.append(int(token))
    target_seq.append(sentinel_to_id[sentinel_count + 1])
    return input_seq, target_seq


def chunk_span_masking(chunks: Sequence[Sequence[int]],
                       sentinel_to_id: Dict[int, int], keep_prob: float,
                       rng: np.random.Generator) -> Tuple[List[int], List[int]]:
    """Span masking at chunk granularity (reference: masking.py:94-127)."""
    masks = rng.random(len(chunks)) > keep_prob
    input_seq: List[int] = []
    target_seq: List[int] = []
    prev_mask = False
    sentinel_count = 0
    for chunk, mask in zip(chunks, masks):
        if mask:
            if not prev_mask:
                sentinel_count += 1
                input_seq.append(sentinel_to_id[sentinel_count])
                target_seq.append(sentinel_to_id[sentinel_count])
            prev_mask = True
            target_seq.extend(int(t) for t in chunk)
        else:
            prev_mask = False
            input_seq.extend(int(t) for t in chunk)
    target_seq.append(sentinel_to_id[sentinel_count + 1])
    return input_seq, target_seq


def get_sentinel_to_id_mapping(tokenizer, match_str: str = "[S_") -> Dict[int, int]:
    """(reference: text_tokenizer.py:110-115)"""
    sentinels = {k: v for k, v in tokenizer.get_vocab().items()
                 if k.startswith(match_str)}
    return {int(k.split("_")[1][:-1]): v
            for k, v in sorted(sentinels.items(), key=lambda kv: kv[1])}


def split_by_sentinel(seq_ids, sentinel_ids):
    """(reference: text_tokenizer.py:118-127)"""
    splits = defaultdict(list)
    cur = None
    for token in seq_ids:
        if token in sentinel_ids:
            cur = token
        else:
            splits[cur].append(token)
    return splits


def merge_span_masking(input_seq, decoder_seq, sentinel_ids):
    """Substitute predicted spans back into the sentinel positions
    (reference: text_tokenizer.py:130-138)."""
    decoder_splits = split_by_sentinel(decoder_seq, sentinel_ids)
    out = []
    for token in input_seq:
        if token in sentinel_ids:
            out.extend(decoder_splits[token])
        else:
            out.append(token)
    return out

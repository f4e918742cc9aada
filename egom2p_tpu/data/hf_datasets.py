"""HuggingFace-datasets loader path.

Equivalent of the reference's huggingface dataset branch
(reference: egom2p/data/unified_datasets.py:448-489 +
pretrain_utils.py:266-289): streaming split, per-process node sharding,
shuffle buffer, text->caption renaming; masking is applied downstream by the
DatasetStream like every other source.

Zero-egress note: hub downloads are unavailable in this environment; local
paths (datasets saved with save_to_disk, or local builder scripts/parquet
dirs) work fully.
"""
from __future__ import annotations

import os
from typing import Iterator, Optional


def huggingface_samples(data_path: str, split: str = "train",
                        streaming: bool = True,
                        shuffle_buffer: int = 1_000,
                        seed: Optional[int] = 0,
                        rename_text_to_caption: bool = True) -> Iterator[dict]:
    """Yield sample dicts from an HF dataset, node-sharded per JAX process.

    (reference: build_huggingface_pretraining_dataloader,
    unified_datasets.py:448-489)."""
    import datasets as hfds
    import jax

    if os.path.isdir(data_path) and (
            os.path.exists(os.path.join(data_path, "dataset_info.json"))
            or os.path.exists(os.path.join(data_path, "dataset_dict.json"))):
        ds = hfds.load_from_disk(data_path)
        if hasattr(ds, "keys"):  # DatasetDict: the split must exist
            if split not in ds.keys():
                raise ValueError(
                    f"split {split!r} not found in {data_path}; "
                    f"available: {sorted(ds.keys())}")
            ds = ds[split]
        if streaming:
            ds = ds.to_iterable_dataset()
    else:
        ds = hfds.load_dataset(data_path, split=split, streaming=streaming)

    if jax.process_count() > 1:
        from datasets.distributed import split_dataset_by_node
        ds = split_dataset_by_node(ds, rank=jax.process_index(),
                                   world_size=jax.process_count())
    if shuffle_buffer and hasattr(ds, "shuffle"):
        try:
            ds = ds.shuffle(buffer_size=shuffle_buffer, seed=seed)
        except TypeError:  # non-streaming Dataset.shuffle has no buffer_size
            ds = ds.shuffle(seed=seed)

    for ex in ds:
        if rename_text_to_caption and "text" in ex and "caption" not in ex:
            ex = dict(ex)
            ex["caption"] = ex.pop("text")
        yield ex

"""Aligned per-modality directory dataset (small/local datasets).

Equivalent of the reference MultiModalDatasetFolder
(reference: egom2p/data/multimodal_dataset_folder.py:204-369) and the
local-folder pretraining path (unified_datasets.py:48-90): each modality is a
directory of <key>.npz/<key>.npy files; samples are the key intersection.
"""
from __future__ import annotations

import glob
import os
from typing import Dict, Iterator, List, Sequence

import numpy as np


class MultiModalFolderDataset:
    def __init__(self, modality_dirs: Dict[str, str]):
        """modality_dirs: {modality_name: directory}."""
        self.modality_dirs = dict(modality_dirs)
        per_mod = {}
        for mod, d in self.modality_dirs.items():
            files = {}
            for f in glob.glob(os.path.join(d, "*")):
                base = os.path.basename(f)
                if "." in base:
                    files[base.split(".", 1)[0]] = f
            per_mod[mod] = files
        self.keys = sorted(set.intersection(*(set(v) for v in per_mod.values()))) \
            if per_mod else []
        self.files = per_mod

    def __len__(self) -> int:
        return len(self.keys)

    def paths(self, idx: int) -> Dict[str, str]:
        """Per-modality file paths of sample idx (no loading)."""
        key = self.keys[idx]
        out = {mod: self.files[mod][key] for mod in self.modality_dirs}
        out["__key__"] = key
        return out

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        key = self.keys[idx]
        out = {}
        for mod in self.modality_dirs:
            f = self.files[mod][key]
            arr = np.load(f)
            if hasattr(arr, "files"):
                arr = arr[arr.files[0]]
            out[mod] = np.asarray(arr)
        out["__key__"] = key
        return out

    def iter_epoch(self, rng: np.random.Generator) -> Iterator[Dict]:
        for i in rng.permutation(len(self)):
            s = self[int(i)]
            s.pop("__key__")
            yield s

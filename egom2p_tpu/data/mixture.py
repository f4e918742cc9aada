"""Mixture dataloader: weighted sampling across datasets + batching.

Equivalent of the reference MixtureDataset / build_mixture_dataloader
(reference: egom2p/data/unified_datasets.py:491-568): each drawn sample comes
from one dataset (weighted choice); modalities absent from that dataset are
padded with fully-masked placeholders so every batch has the same fixed-shape
modality dict (make_empty_mod_dict, unified_datasets.py:491-553).

Output batches are host numpy arrays ready for jax.device_put; double
buffering is handled by a small background prefetch thread.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from egom2p_tpu.masking.unified import UnifiedMasking


def make_empty_mod_entry(info: Dict) -> Dict[str, np.ndarray]:
    """Fully-masked placeholder for a modality absent from a dataset
    (reference: unified_datasets.py:491-553).  The tensor shape/dtype must
    match what UnifiedMasking emits for real samples of that modality or
    np.stack in the batcher fails."""
    spec = info.get("embed_spec", {})
    kind = spec.get("kind", "")
    if kind == "sequence_emb":
        # float embedding rows, token-level masks (sequence_emb_mask_span)
        L = info["max_tokens"]
        tensor = np.zeros((L, spec["orig_emb_dim"]), dtype=np.float32)
    elif kind == "image_raw":
        # raw pixels pass through image_mask untouched; masks are per patch
        L = info["max_tokens"]
        size, ch = spec["image_size"], spec["num_channels"]
        tensor = np.zeros((size, size, ch), dtype=np.float32)
    elif info["type"] in ("img", "cam", "gaze", "keypoints"):
        L = info["max_tokens"]
        tensor = np.zeros(L, dtype=np.int32)
    else:
        L = (info["max_tokens"] + 1) * 2
        tensor = np.zeros(L, dtype=np.int32)
    return {
        "tensor": tensor,
        "input_mask": np.ones(L, dtype=bool),
        "target_mask": np.ones(L, dtype=bool),
        "decoder_attention_mask": np.zeros(L, dtype=np.int32),
    }


class DatasetStream:
    """One dataset: raw-sample iterator + its UnifiedMasking instance."""

    def __init__(self, name: str, sample_iter_factory, masking: UnifiedMasking):
        self.name = name
        self.factory = sample_iter_factory
        self.masking = masking
        self._factory_kw: Dict = {}
        self._it = iter(self.factory())

    def reseed(self, worker_seed: int, worker_id: int = 0,
               num_workers: int = 1) -> None:
        """Give this (forked) copy of the stream an independent sample order:
        reseeds the masking rng and, when the factory supports it, rebuilds
        the raw iterator with a worker-specific shuffle AND a per-worker
        shard split (the reference splits wds shards per DataLoader worker,
        unified_datasets.py:373-398)."""
        import inspect
        self.masking.rng = np.random.default_rng(worker_seed)
        try:
            params = inspect.signature(self.factory).parameters
            kw = {}
            if "seed" in params:
                kw["seed"] = worker_seed
            if "worker_id" in params and "num_workers" in params:
                kw["worker_id"] = worker_id
                kw["num_workers"] = num_workers
            if kw:
                # remembered for exhaustion rebuilds: the worker must keep
                # its shard split + seed on every pass, not just the first
                self._factory_kw = kw
                self._it = iter(self.factory(**kw))
                return
        except (TypeError, ValueError):
            pass
        self._it = iter(self.factory())

    def __next__(self):
        try:
            raw = next(self._it)
        except StopIteration:
            if "seed" in self._factory_kw:
                # advance the shuffle seed per pass, else every epoch of a
                # worker replays the identical sample order
                self._factory_kw = {**self._factory_kw,
                                    "seed": self._factory_kw["seed"] + 1}
            self._it = iter(self.factory(**self._factory_kw))
            raw = next(self._it)
        return self.masking(raw)


class MixtureLoader:
    """Weighted mixture of DatasetStreams -> fixed-shape numpy batches."""

    def __init__(self, streams: Sequence[DatasetStream],
                 weights: Optional[Sequence[float]],
                 all_modality_info: Dict, batch_size: int,
                 seed: int = 0, prefetch: int = 2, num_workers: int = 0):
        self.streams = list(streams)
        w = np.asarray(weights if weights is not None
                       else [1.0] * len(streams), dtype=np.float64)
        self.weights = w / w.sum()
        self.all_info = all_modality_info
        self.batch_size = batch_size
        self.seed = seed
        self.rng = np.random.default_rng(seed)
        self.prefetch = prefetch
        # 0 = single background thread (dev/tests); N>0 = N forked worker
        # processes, the TPU-host equivalent of the reference's multi-worker
        # DataLoaders (unified_datasets.py:373-398)
        self.num_workers = num_workers

    def _one_sample(self) -> Dict:
        idx = int(self.rng.choice(len(self.streams), p=self.weights))
        masked = next(self.streams[idx])
        # pad absent modalities with fully-masked placeholders
        for mod, info in self.all_info.items():
            if mod not in masked:
                masked[mod] = make_empty_mod_entry(info)
        return masked

    def _one_batch(self) -> Dict:
        samples = [self._one_sample() for _ in range(self.batch_size)]
        batch = {}
        for mod in self.all_info:
            batch[mod] = {
                k: np.stack([s[mod][k] for s in samples])
                for k in ("tensor", "input_mask", "target_mask",
                          "decoder_attention_mask")
            }
            # shards may store tokens as narrow ints (reference converts
            # int16 -> int64 on load, unified_datasets.py:218-222); float
            # modalities (seq_emb embeddings, raw pixels) stay float32
            t = batch[mod]["tensor"]
            batch[mod]["tensor"] = (t.astype(np.int32) if t.dtype.kind in "iu"
                                    else t.astype(np.float32))
        return batch

    # ------------------------------------------------- multi-process workers
    def _worker_loop(self, mpq, worker_id: int) -> None:
        """Runs in a forked child: independent rng + reseeded streams, pushes
        ready batches to the parent."""
        import zlib
        try:
            self.rng = np.random.default_rng(
                self.seed + 1000 * (worker_id + 1))
            for s in self.streams:
                # crc32, not hash(): str hash is PYTHONHASHSEED-randomized
                # per interpreter, which would break cross-run reproducibility
                name_salt = zlib.crc32(s.name.encode()) % 997 + 1
                s.reseed(self.seed + 1000 * (worker_id + 1) + name_salt,
                         worker_id=worker_id, num_workers=self.num_workers)
            while True:
                mpq.put(self._one_batch())
        except Exception as e:  # pragma: no cover - surfaced in consumer
            mpq.put(e)

    def _iter_multiprocess(self) -> Iterator[Dict]:
        import multiprocessing as mp
        ctx = mp.get_context("fork")
        q = ctx.Queue(maxsize=max(self.prefetch, self.num_workers))
        procs = [ctx.Process(target=self._worker_loop, args=(q, w),
                             daemon=True)
                 for w in range(self.num_workers)]
        for p in procs:
            p.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            for p in procs:
                p.terminate()

    def __iter__(self) -> Iterator[Dict]:
        if self.num_workers > 0:
            yield from self._iter_multiprocess()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker():
            try:
                while not stop.is_set():
                    item = self._one_batch()
                    while not stop.is_set():
                        try:
                            q.put(item, timeout=0.25)
                            break
                        except queue.Full:
                            continue
            except Exception as e:  # surfaces in the consumer
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            # abandoning the iterator (e.g. a bounded eval pass) must stop
            # the prefetch thread, or every eval leaks a thread + open tars
            stop.set()
            try:
                q.get_nowait()
            except queue.Empty:
                pass

"""Tar reader, mixture loader and shard-builder tests (host-side)."""
import io
import os
import subprocess
import sys
import tarfile

import numpy as np
import pytest

from egom2p_tpu.data.tar_reader import (braceexpand, iter_tar_samples,
                                        multi_tarfile_samples, shard_split,
                                        shuffled)


def test_braceexpand():
    assert braceexpand("shard-{000..002}.tar") == [
        "shard-000.tar", "shard-001.tar", "shard-002.tar"]
    out = braceexpand("[rgb,depth]/s-{00..01}.tar")
    assert out == ["rgb/s-00.tar", "rgb/s-01.tar",
                   "depth/s-00.tar", "depth/s-01.tar"]
    assert braceexpand("plain.tar") == ["plain.tar"]


def _write_tar(path, keys, shape=(4,), seed=0):
    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w") as tar:
        for k in keys:
            buf = io.BytesIO()
            np.savez(buf, rng.integers(0, 100, size=shape).astype(np.int32))
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"{k}.npz")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))


def test_aligned_multi_tar(tmp_path):
    keys = [f"clip{i:03d}" for i in range(5)]
    _write_tar(tmp_path / "rgb.tar", keys, seed=1)
    _write_tar(tmp_path / "cam.tar", keys, seed=2)
    samples = list(multi_tarfile_samples(
        {"tok_rgb": [str(tmp_path / "rgb.tar")],
         "tok_cam": [str(tmp_path / "cam.tar")]}))
    assert len(samples) == 5
    assert set(samples[0]) == {"__key__", "tok_rgb", "tok_cam"}
    assert samples[0]["__key__"] == "clip000"
    assert samples[0]["tok_rgb"].shape == (4,)


def test_misaligned_tars_skipped(tmp_path):
    _write_tar(tmp_path / "rgb.tar", ["a", "b"])
    _write_tar(tmp_path / "cam.tar", ["a", "c"])
    # warn handler skips the bad shard entirely
    samples = list(multi_tarfile_samples(
        {"r": [str(tmp_path / "rgb.tar")], "c": [str(tmp_path / "cam.tar")]},
        handler="warn"))
    assert samples == [] or all(s["__key__"] == "a" for s in samples)
    with pytest.raises(ValueError):
        list(multi_tarfile_samples(
            {"r": [str(tmp_path / "rgb.tar")],
             "c": [str(tmp_path / "cam.tar")]}, handler="raise"))


def test_shard_split_and_shuffle():
    shards = list(range(10))
    a = shard_split(shards, 0, 2)
    b = shard_split(shards, 1, 2)
    assert sorted(a + b) == shards and not set(a) & set(b)
    import random
    out = list(shuffled(iter(range(100)), 16, random.Random(0)))
    assert sorted(out) == list(range(100))
    assert out != list(range(100))


def test_prepare_aligned_shards_cli(tmp_path):
    for mod in ("rgb", "cam"):
        d = tmp_path / mod
        d.mkdir()
        for i in range(7):
            np.save(d / f"clip{i:03d}.npy", np.arange(3))
    # one extra unaligned key
    np.save(tmp_path / "rgb" / "extra.npy", np.arange(3))
    out = tmp_path / "shards"
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "prepare_aligned_shards.py"),
         "--modality", f"rgb={tmp_path}/rgb", "--modality", f"cam={tmp_path}/cam",
         "--output-dir", str(out), "--shard-size", "4"],
        capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    for mod in ("rgb", "cam"):
        tars = sorted((out / mod).glob("shard-*.tar"))
        assert len(tars) == 2  # 7 keys / shard-size 4
        with tarfile.open(tars[0]) as t:
            assert len(t.getnames()) == 4
    # alignment: same member keys in the same order
    import tarfile as tf
    with tf.open(out / "rgb" / "shard-000000.tar") as a, \
         tf.open(out / "cam" / "shard-000000.tar") as b:
        ka = [n.split(".")[0] for n in a.getnames()]
        kb = [n.split(".")[0] for n in b.getnames()]
        assert ka == kb


def test_mixture_loader_multiprocess_workers():
    """num_workers>0 must yield valid fixed-shape batches from forked
    workers with independent sample orders (weak item: single-threaded
    input pipeline)."""
    import numpy as np

    from egom2p_tpu.data.mixture import DatasetStream, MixtureLoader
    from egom2p_tpu.data.modality_info import make_scaled_modality_info
    from egom2p_tpu.masking.unified import UnifiedMasking

    info = make_scaled_modality_info()
    for m in info:
        info[m]["input_alphas"] = [1.0]
        info[m]["target_alphas"] = [1.0]
    rng = np.random.default_rng(0)
    pool = [{m: rng.integers(0, info[m]["vocab_size"],
                             size=info[m]["max_tokens"]).astype(np.int32)
             for m in info} for _ in range(32)]

    def factory(seed=None):
        order = (np.random.default_rng(seed).permutation(len(pool))
                 if seed is not None else range(len(pool)))

        def gen():
            while True:
                for i in order:
                    yield pool[i]
        return gen()

    masking = UnifiedMasking(info, None, 16, 16, seed=0)
    loader = MixtureLoader([DatasetStream("p", factory, masking)], None,
                           info, batch_size=4, seed=0, num_workers=2)
    it = iter(loader)
    batches = [next(it) for _ in range(4)]
    for b in batches:
        assert set(b) == set(info)
        for m in b:
            assert b[m]["tensor"].shape[0] == 4
            assert b[m]["tensor"].dtype == np.int32
    # workers must not produce identical masking streams: at least one pair
    # of batches differs
    flat = [np.concatenate([b[m]["input_mask"].ravel() for m in sorted(b)])
            for b in batches]
    assert any(not np.array_equal(flat[0], f) for f in flat[1:])


def test_huggingface_dataset_path(tmp_path):
    """HF-datasets source: local save_to_disk dataset streams through
    setup_data's huggingface branch (reference: unified_datasets.py:448-489)."""
    import numpy as np
    import yaml

    import datasets as hfds
    import run_training_egom2p as T
    from egom2p_tpu.core.mesh import make_mesh
    from egom2p_tpu.data.hf_datasets import huggingface_samples
    from egom2p_tpu.data.modality_info import MODALITY_INFO

    rng = np.random.default_rng(0)
    L_rgb = MODALITY_INFO["tok_rgb"]["max_tokens"]
    L_cam = MODALITY_INFO["tok_cam"]["max_tokens"]
    ds = hfds.Dataset.from_dict({
        "tok_rgb": [rng.integers(0, 64000, L_rgb).tolist() for _ in range(6)],
        "tok_cam": [rng.integers(0, 256, L_cam).tolist() for _ in range(6)],
        "text": [f"sample {i}" for i in range(6)],
    })
    ds_dir = str(tmp_path / "hfds")
    ds.save_to_disk(ds_dir)

    # raw stream: text renamed to caption
    ex = next(iter(huggingface_samples(ds_dir, shuffle_buffer=0)))
    assert "caption" in ex and "tok_rgb" in ex

    cfg = {"train": {"datasets": {"hf": {
        "type": "huggingface",
        "in_domains": "tok_rgb-tok_cam", "out_domains": "tok_rgb-tok_cam",
        "input_alphas": "1.0", "target_alphas": "1.0",
        "data_path": ds_dir,
    }}, "weights": [1.0]}}
    cfg_path = tmp_path / "data.yaml"
    cfg_path.write_text(yaml.dump(cfg))
    args = T.get_args(["--data_config", str(cfg_path),
                       "--num_input_tokens", "64",
                       "--num_target_tokens", "64",
                       "--batch_size", "2",
                       "--output_dir", str(tmp_path / "out")])
    loader, domains = T.setup_data(args, make_mesh())
    assert set(domains) == {"tok_rgb", "tok_cam"}
    batch = next(iter(loader))
    assert batch["tok_rgb"]["tensor"].shape[1] == L_rgb
    assert batch["tok_cam"]["tensor"].dtype == np.int32


def test_mixture_float_modality_placeholders_and_dtype():
    """seq_emb (float embeddings) must survive batching with the right
    placeholder shape when absent from a dataset, and must NOT be cast to
    int (review findings: blanket int32 cast / 1-D int placeholder)."""
    import numpy as np

    from egom2p_tpu.data.mixture import (DatasetStream, MixtureLoader,
                                         make_empty_mod_entry)
    from egom2p_tpu.masking.unified import UnifiedMasking

    info = {
        "tok_cam": {"type": "cam", "vocab_size": 256, "min_tokens": 0,
                    "max_tokens": 8, "id": 1,
                    "input_alphas": [1.0], "target_alphas": [1.0]},
        "t5_caption": {"type": "seq_emb", "min_tokens": 0, "max_tokens": 6,
                       "id": 2, "input_alphas": [1.0], "target_alphas": [0.0],
                       "keep": ["all"],
                       "embed_spec": {"kind": "sequence_emb", "max_length": 6,
                                      "orig_emb_dim": 16}},
    }
    # placeholder shape matches the masked-sample shape
    ph = make_empty_mod_entry(info["t5_caption"])
    assert ph["tensor"].shape == (6, 16) and ph["tensor"].dtype == np.float32
    assert ph["input_mask"].shape == (6,)

    # dataset A provides both modalities, dataset B only tok_cam
    rng = np.random.default_rng(0)

    def gen_full():
        while True:
            yield {"tok_cam": rng.integers(0, 256, 8).astype(np.int32),
                   "t5_caption": rng.normal(size=(6, 16)).astype(np.float32)}

    def gen_cam_only():
        while True:
            yield {"tok_cam": rng.integers(0, 256, 8).astype(np.int32)}

    class _FakeTok:
        # minimal WordPiece-ish surface for sentinel machinery
        def get_vocab(self):
            v = {f"[S_{i}]": 10 + i for i in range(10)}
            v.update({"[PAD]": 0, "[EOS]": 3})
            return v

        def token_to_id(self, t):
            return self.get_vocab()[t]

    cam_only_info = {"tok_cam": info["tok_cam"]}
    mask_full = UnifiedMasking(info, _FakeTok(), 8, 8, seed=0)
    mask_cam = UnifiedMasking(cam_only_info, None, 8, 8, seed=1)
    loader = MixtureLoader(
        [DatasetStream("full", gen_full, mask_full),
         DatasetStream("camonly", gen_cam_only, mask_cam)],
        None, info, batch_size=8, seed=0)
    batch = next(iter(loader))
    assert batch["t5_caption"]["tensor"].shape == (8, 6, 16)
    assert batch["t5_caption"]["tensor"].dtype == np.float32
    assert batch["tok_cam"]["tensor"].dtype == np.int32
    # float values must not be integer-truncated: some non-integral entries
    t = batch["t5_caption"]["tensor"]
    assert (np.abs(t - np.round(t)) > 1e-3).any()


def test_shuffled_zero_buffer_passthrough():
    import random

    from egom2p_tpu.data.tar_reader import shuffled

    out = list(shuffled(iter(range(5)), 0, random.Random(0)))
    assert out == [0, 1, 2, 3, 4]


def test_repeated_single_pass():
    from egom2p_tpu.data.tar_reader import repeated

    out = list(repeated(lambda: iter([1, 2]), 2))
    assert out == [1, 1, 2, 2]


def test_mixture_thread_stops_when_iterator_abandoned():
    import gc
    import threading
    import time

    import numpy as np

    from egom2p_tpu.data.mixture import DatasetStream, MixtureLoader
    from egom2p_tpu.masking.unified import UnifiedMasking

    info = {"tok_cam": {"type": "cam", "vocab_size": 256, "min_tokens": 0,
                        "max_tokens": 8, "id": 1,
                        "input_alphas": [1.0], "target_alphas": [1.0]}}

    def gen():
        rng = np.random.default_rng(0)
        while True:
            yield {"tok_cam": rng.integers(0, 256, 8).astype(np.int32)}

    masking = UnifiedMasking(info, None, 8, 8, seed=0)
    loader = MixtureLoader([DatasetStream("p", gen, masking)], None, info,
                           batch_size=2, seed=0)
    before = set(threading.enumerate())
    it = iter(loader)
    next(it)
    spawned = [t for t in threading.enumerate()
               if t not in before and "worker" in t.name]
    assert len(spawned) == 1  # unrelated pool threads may also appear
    it.close()  # triggers the generator's finally -> stop event
    del it
    gc.collect()
    deadline = time.time() + 5
    while spawned[0].is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not spawned[0].is_alive()

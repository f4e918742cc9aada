#!/usr/bin/env python
"""Build aligned per-modality webdataset shards for pretraining.

Equivalent of the reference's aligned-data generation
(reference: gen_aligned_training_data.py + the `[rgb,depth,cam,gaze]/...`
shard layout consumed by egom2p/data/unified_datasets.py:240-320): collect
per-clip artifacts for each modality (token npz from tokenize_videos.py /
run_training_vqvae.py --tokenize, or raw npy), intersect keys so every shard
is perfectly aligned, and write one tar per modality per shard with identical
member ordering.

Usage:
    python prepare_aligned_shards.py \
        --modality rgb=tokens/rgb_npz_dir --modality depth=tokens/depth_npz_dir \
        --modality cam=tokens/cam_npz_dir --modality gaze=tokens/gaze_npz_dir \
        --output-dir shards/mydataset --shard-size 1000
Produces shards/mydataset/{rgb,depth,cam,gaze}/shard-000000.tar ... usable as
    data_path: 'shards/mydataset/[rgb,depth,cam,gaze]/shard-{000000..N}.tar'
"""
from __future__ import annotations

import argparse
import glob
import os
import tarfile


def get_args():
    p = argparse.ArgumentParser("aligned shard builder")
    p.add_argument("--modality", action="append", required=True,
                   help="name=directory (repeat per modality); directory "
                        "holds <key>.npz/<key>.npy files")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--shard-size", type=int, default=1000,
                   help="samples per shard")
    return p.parse_args()


def main():
    args = get_args()
    mods = dict(m.split("=", 1) for m in args.modality)

    per_mod_files = {}
    for mod, d in mods.items():
        files = {}
        collisions = []
        for f in sorted(glob.glob(os.path.join(d, "*"))):
            base = os.path.basename(f)
            if "." not in base:
                continue
            key = base.split(".", 1)[0]
            if key in files:  # e.g. clip1.npz next to clip1.npy: which file
                collisions.append((key, files[key], f))  # wins would be
                continue                                 # filesystem luck
            files[key] = f
        if collisions:
            k, a, b = collisions[0]
            raise SystemExit(
                f"{mod}: {len(collisions)} basename-stem collision(s) in {d} "
                f"(e.g. key {k!r}: {a} vs {b}); a sample would silently get "
                f"an arbitrary file — disambiguate the directory first")
        per_mod_files[mod] = files
        print(f"{mod}: {len(files)} samples in {d}")

    keys = set.intersection(*(set(f) for f in per_mod_files.values()))
    keys = sorted(keys)
    dropped = {m: len(f) - len(keys) for m, f in per_mod_files.items()}
    print(f"aligned keys: {len(keys)} (dropped per modality: {dropped})")
    if not keys:
        raise SystemExit("no aligned keys across modalities")

    for mod in mods:
        os.makedirs(os.path.join(args.output_dir, mod), exist_ok=True)

    n_shards = (len(keys) + args.shard_size - 1) // args.shard_size
    for s in range(n_shards):
        chunk = keys[s * args.shard_size:(s + 1) * args.shard_size]
        for mod in mods:
            out = os.path.join(args.output_dir, mod, f"shard-{s:06d}.tar")
            with tarfile.open(out, "w") as tar:
                for key in chunk:
                    tar.add(per_mod_files[mod][key],
                            arcname=os.path.basename(per_mod_files[mod][key]))
        print(f"shard {s:06d}: {len(chunk)} samples x {len(mods)} modalities")
    print(f"done: {n_shards} shards under {args.output_dir}")


if __name__ == "__main__":
    main()

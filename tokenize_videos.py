#!/usr/bin/env python
"""Offline video pre-tokenization (production path).

Equivalent of the reference batch tokenizer CLI
(reference: cosmos_tokenizer/video_cli.py:158-299): walks tar shards (or
directories) of mp4 clips, applies the standard EgoM2P preprocessing
(fps resample to 8, center square crop, Lanczos scale to 256) with the native
ingest library, tokenizes with the Cosmos DV4x8x8 tokenizer in batched
17-frame windows, and writes `.npz` int32 token members into output tars
(int32: the DV codebook has 64k entries, see the note at the write site).

The reference forks one process per GPU; here one TPU chip streams batches
with host-side decode overlapped via a prefetch thread.

Usage:
    python tokenize_videos.py --input 'shards/shard-{000000..000195}.tar' \
        --output-dir tokens/rgb --video-tok-ckpt ckpt/cosmos-dv4x8x8
    python tokenize_videos.py --input clips_dir/ --output-dir tokens/rgb --smoke
"""
from __future__ import annotations

import argparse
import glob
import io
import os
import queue
import tarfile
import tempfile
import threading
import time

import numpy as np


def get_args():
    p = argparse.ArgumentParser("video pre-tokenization")
    p.add_argument("--input", required=True,
                   help="tar shard pattern (brace expansion) or a directory "
                        "of mp4s")
    p.add_argument("--output-dir", required=True)
    p.add_argument("--video-tok-ckpt", default="./ckpt/cosmos-dv4x8x8")
    p.add_argument("--fps", type=float, default=8.0)
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--temporal-window", type=int, default=17)
    p.add_argument("--batch", type=int, default=8,
                   help="clips tokenized per device batch")
    p.add_argument("--max-frames", type=int, default=16,
                   help="frames per clip after resampling (2s @ 8fps)")
    p.add_argument("--smoke", action="store_true",
                   help="random tokenizer weights (pipeline check)")
    return p.parse_args()


def iter_clips(args):
    """Yield (key, mp4_bytes_or_path, out_tar_name)."""
    from egom2p_tpu.data.tar_reader import braceexpand

    if os.path.isdir(args.input):
        files = sorted(glob.glob(os.path.join(args.input, "*.mp4")))
        for f in files:
            yield os.path.splitext(os.path.basename(f))[0], f, "shard-000000.tar"
        return
    for shard in braceexpand(args.input):
        out_name = os.path.basename(shard)
        with tarfile.open(shard, "r") as tar:
            for member in tar:
                if not member.isfile() or not member.name.endswith(".mp4"):
                    continue
                f = tar.extractfile(member)
                if f is None:
                    continue
                key = os.path.splitext(os.path.basename(member.name))[0]
                yield key, f.read(), out_name


def decode_worker(args, clip_iter, q):
    from egom2p_tpu.data.video_ingest import read_video

    try:
        _decode_loop(args, clip_iter, q, read_video)
    except Exception as e:
        # an error from the shard iterator itself (e.g. a truncated tar)
        # must still release the consumer: report it, then signal the end
        print(f"[tokenize_videos] input stream failed: {e}")
    finally:
        q.put(None)


def _decode_loop(args, clip_iter, q, read_video):
    for key, src, out_name in clip_iter:
        try:
            if isinstance(src, bytes):
                with tempfile.NamedTemporaryFile(suffix=".mp4") as tmp:
                    tmp.write(src)
                    tmp.flush()
                    video = read_video(tmp.name, out_size=args.size,
                                       target_fps=args.fps,
                                       max_frames=args.max_frames)
            else:
                video = read_video(src, out_size=args.size,
                                   target_fps=args.fps,
                                   max_frames=args.max_frames)
            if video.shape[0] < args.max_frames:
                # edge-pad short clips (reference pads temporally,
                # utils.py:366-376)
                pad = args.max_frames - video.shape[0]
                video = np.concatenate(
                    [video, np.repeat(video[-1:], pad, axis=0)], axis=0)
            q.put((key, video[: args.max_frames], out_name))
        except Exception as e:  # bad clip: skip, like wds warn_and_continue
            print(f"[skip] {key}: {e}")


def main():
    args = get_args()
    import jax
    from egom2p_tpu.core.cache import enable_persistent_cache
    from egom2p_tpu.tokenizers.cosmos import CausalVideoTokenizer
    from egom2p_tpu.core.checkpoint import load_checkpoint

    enable_persistent_cache()
    if args.smoke or not os.path.exists(args.video_tok_ckpt):
        if not args.smoke:
            print(f"[warn] {args.video_tok_ckpt} missing -> random weights")
        tok = CausalVideoTokenizer.random_init(jax.random.PRNGKey(0))
    elif args.video_tok_ckpt.endswith((".jit", ".pth")):
        from egom2p_tpu.compat.torch_convert import load_cosmos_dv_pth
        tok = load_cosmos_dv_pth(args.video_tok_ckpt)
    else:
        tok = CausalVideoTokenizer(load_checkpoint(args.video_tok_ckpt))

    os.makedirs(args.output_dir, exist_ok=True)
    q: "queue.Queue" = queue.Queue(maxsize=args.batch * 4)
    t = threading.Thread(target=decode_worker,
                         args=(args, iter_clips(args), q), daemon=True)
    t.start()

    out_tars = {}

    def get_tar(name):
        if name not in out_tars:
            out_tars[name] = tarfile.open(
                os.path.join(args.output_dir, name), "w")
        return out_tars[name]

    def flush_batch(batch):
        keys = [b[0] for b in batch]
        videos = np.stack([b[1] for b in batch])
        tokens = tok.forward(videos, temporal_window=args.temporal_window)
        for key, toks, out_name in zip(keys, tokens, (b[2] for b in batch)):
            buf = io.BytesIO()
            # video tokens exceed int16 range (64k vocab); store int32 like the
            # reference's video_cli (cam/gaze 256-vocab tokens use int16)
            np.savez_compressed(buf, toks.astype(np.int32))
            data = buf.getvalue()
            info = tarfile.TarInfo(name=f"{key}.npz")
            info.size = len(data)
            get_tar(out_name).addfile(info, io.BytesIO(data))
        return len(keys)

    n_done, batch = 0, []
    t0 = time.time()
    while True:
        item = q.get()
        if item is None:
            break
        batch.append(item)
        if len(batch) == args.batch:
            n_done += flush_batch(batch)
            batch = []
            rate = n_done / (time.time() - t0)
            print(f"tokenized {n_done} clips ({rate:.2f} clips/s)", flush=True)
    if batch:
        n_done += flush_batch(batch)
    for tar in out_tars.values():
        tar.close()
    print(f"done: {n_done} clips in {time.time()-t0:.1f}s "
          f"-> {sorted(out_tars)}")


if __name__ == "__main__":
    main()

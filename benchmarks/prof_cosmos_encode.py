#!/usr/bin/env python
"""On-chip profile of the Cosmos DV4x8x8 encode path (tokenize stage).

Times encode (and optionally decode) alone, warm-loop with a single
final sync, so conv-layout experiments can be A/B'd without paying the
full bench compile.  History: bench.py r03 reported tokenize at ~231 ms
per 8-clip batch (9% MFU vs the 4.26 TF cost analysis); this harness
showed the true warm number is 38.6 ms (56% MFU, roofline-bound) and the
231 ms was an un-warmed stage loop absorbing relay tail latency — fixed
in bench.py.  A/B record (2026-08-20): native XLA 3D conv 38.6 ms vs
tap-unrolled decomposition (EGOM2P_CONV3D_UNROLL=1) 43.2 ms.

Usage:  PYTHONPATH=$AXON_SITE:. python benchmarks/prof_cosmos_encode.py \
            [--decode] [--batch 8]
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--decode", action="store_true")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    from egom2p_tpu.core.cache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import types
    from egom2p_tpu.cli import eval_common

    B = args.batch
    targs = types.SimpleNamespace(video_tok_ckpt="./ckpt/cosmos-dv4x8x8",
                                  smoke=True, seed=0)
    vt = eval_common.load_video_tokenizer(targs)
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (B, 17, 256, 256, 3),
                                          dtype=np.uint8))

    enc = jax.jit(vt._encode_u8)
    c = enc.lower(vt.params, x).compile().cost_analysis()
    flops = float(c.get("flops", 0.0))
    nbytes = sum(v for k, v in c.items() if k.startswith("bytes accessed"))

    toks = enc(vt.params, x)
    _ = int(toks[0].reshape(-1)[0])  # sync (relay-safe scalar read)
    t0 = time.time()
    for _ in range(args.reps):
        toks = enc(vt.params, x)
    _ = int(toks[0].reshape(-1)[0])
    dt = (time.time() - t0) / args.reps
    print(f"encode B={B}: {dt*1000:.1f} ms  "
          f"{flops/dt/1e12:.1f} TF/s ({flops/dt/1e12/197*100:.1f}% MFU)  "
          f"{nbytes/dt/1e9:.0f} GB/s ({nbytes/dt/819e9*100:.0f}% HBM)  "
          f"[roofline {max(flops/197e12, nbytes/819e9)*1000:.1f} ms]")

    if args.decode:
        idx = toks[0] if isinstance(toks, tuple) else toks
        out = vt.decode(idx)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        t0 = time.time()
        for _ in range(args.reps):
            out = vt.decode(idx)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        dt = (time.time() - t0) / args.reps
        print(f"decode B={B}: {dt*1000:.1f} ms")


if __name__ == "__main__":
    main()

"""Block-size sweep for the flash64 TRAINING kernels (ops/flash64_train.py)
at the pretraining attention shapes: B=8, C=768 (12 heads x hd 64), N=M=2048.

Times one fwd+bwd (value_and_grad) step per (bq, bk) pair for the two mask
modes the train step uses (key-padding and segment).  Run on real TPU:

    python benchmarks/prof_flash64_train_blocks.py 512,512 1024,512 ...

Defaults to a standard sweep when no pairs are given.
"""
import os
import sys
import time

import numpy as np

from egom2p_tpu.core.cache import enable_persistent_cache

enable_persistent_cache()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from egom2p_tpu.ops.flash64_train import flash64_train_attention  # noqa: E402


_sync = jax.jit(lambda a: a.reshape(-1)[0])  # compile once; keep timings pure


def syncarr(x):
    return np.asarray(_sync(x))


B, H, N, hd = 8, 12, 2048, 64
C = H * hd
k0 = jax.random.PRNGKey(0)
q = jax.random.normal(k0, (B, N, C), jnp.bfloat16)
k = jax.random.normal(jax.random.fold_in(k0, 1), (B, N, C), jnp.bfloat16)
v = jax.random.normal(jax.random.fold_in(k0, 2), (B, N, C), jnp.bfloat16)
kvb = jnp.zeros((B, N), bool).at[:, N - 128:].set(True)
seg = jnp.asarray(np.repeat(np.arange(4), N // 4)[None].repeat(B, 0))
# fwd 4*B*H*N*M*hd; bwd ~2.5x (dq: 3 matmuls, dkv: 4, vs fwd 2)
FL = 4 * B * H * N * N * hd * 3.5


def run(bq, bk):
    os.environ["EGOM2P_F64T_BQ"] = str(bq)
    os.environ["EGOM2P_F64T_BK"] = str(bk)
    for mode, kw in (("kp", dict(kv_blocked=kvb)),
                     ("seg", dict(segments=seg))):
        def loss(q, k, v, kw=kw):
            o = flash64_train_attention(q, k, v, **kw)
            return jnp.sum(o.astype(jnp.float32) ** 2)

        g = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
        out = g(q, k, v)
        syncarr(out[1][0])
        # K dispatches per timing rep with ONE final sync: a per-call sync
        # through the axon relay adds ~25ms RTT and swamps a ~10ms kernel
        # (the first sweep of this file measured relay latency, not kernels)
        K = 8
        times = []
        for _ in range(3):
            t0 = time.time()
            qi = q
            for _ in range(K):
                out = g(qi, k, v)
                # chain dq -> q: serializes on-device. Rescale to unit max so
                # the sum(o^2) loss can't overflow bf16 to inf/NaN across the
                # K chained iterations (kernel timing is data-independent, but
                # keep the inputs sane anyway).
                dq = out[1][0]
                qi = (dq / jnp.maximum(jnp.max(jnp.abs(dq)).astype(
                    jnp.float32), 1.0)).astype(q.dtype)
            syncarr(qi)
            times.append((time.time() - t0) / K)
        dt = min(times) * 1000
        print("mode=%-3s bq=%4d bk=%4d: %6.2f ms  %.1f TF/s"
              % (mode, bq, bk, dt, FL / dt / 1e9), flush=True)


specs = sys.argv[1:] or ["256,256", "512,512", "512,1024", "1024,512",
                         "1024,1024", "2048,512", "512,2048", "2048,2048"]
for spec in specs:
    bq, bk = map(int, spec.split(","))
    try:
        run(bq, bk)
    except Exception as e:  # noqa: BLE001 — report and keep sweeping
        print("bq=%d bk=%d failed: %s" % (bq, bk, str(e)[:120]), flush=True)

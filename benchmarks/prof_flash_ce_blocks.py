"""Block-size sweep for the Pallas flash-CE forward (ops/flash_ce.py) at
the pretraining head shapes: R = 8*2048 rows, D = 768, V = 64000.

Times the forward-only row-stats kernel per (br, bv) pair plus the
XLA chunked-logsumexp reference.  Run on real TPU:

    python benchmarks/prof_flash_ce_blocks.py 512,6400 1024,3200 ...

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

from egom2p_tpu.ops import flash_ce  # noqa: E402

_sync = jax.jit(lambda a: a.reshape(-1)[0])


def syncval(x):
    return float(np.asarray(_sync(x)))


R, D, V = 8 * 2048, 768, 64000
k0 = jax.random.PRNGKey(0)
y = jax.random.normal(k0, (R, D), jnp.bfloat16)
w = jax.random.normal(jax.random.fold_in(k0, 1), (V, D), jnp.bfloat16) * 0.02
t = jax.random.randint(jax.random.fold_in(k0, 2), (R,), 0, V, jnp.int32)
FL = 2 * R * D * V  # one logits matmul


def run(br, bv):
    os.environ["EGOM2P_CE_BR"] = str(br)
    os.environ["EGOM2P_CE_BV"] = str(bv)

    @jax.jit
    def f(y):
        logz, gold = flash_ce._row_stats(y, w, t)
        return jnp.sum(logz) + jnp.sum(gold)

    syncval(f(y))
    K = 8
    t0 = time.time()
    r = None
    for _ in range(K):
        r = f(y)
    syncval(r)
    dt = (time.time() - t0) / K * 1e3
    print(f"br={br:5d} bv={bv:6d}: {dt:7.2f} ms  {FL / dt / 1e9:6.1f} TF/s",
          flush=True)


def run_xla_ref(chunk=2048):
    @jax.jit
    def f(y):
        yc = y.reshape(-1, chunk, D)
        tc = t.reshape(-1, chunk)

        def body(c, inp):
            y_c, t_c = inp
            logits = jnp.einsum("rd,vd->rv", y_c, w,
                                preferred_element_type=jnp.float32)
            logz = jax.nn.logsumexp(logits, axis=-1)
            gold = jnp.take_along_axis(logits, t_c[:, None], -1)[:, 0]
            return c + jnp.sum(logz) + jnp.sum(gold), None

        out, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (yc, tc))
        return out

    syncval(f(y))
    K = 8
    t0 = time.time()
    r = None
    for _ in range(K):
        r = f(y)
    syncval(r)
    dt = (time.time() - t0) / K * 1e3
    print(f"xla chunked ref   : {dt:7.2f} ms  {FL / dt / 1e9:6.1f} TF/s",
          flush=True)


if __name__ == "__main__":
    pairs = [tuple(map(int, a.split(","))) for a in sys.argv[1:]] or [
        (256, 6400), (512, 3200), (512, 6400), (512, 12800),
        (1024, 3200), (1024, 6400), (2048, 3200),
    ]
    run_xla_ref()
    for br, bv in pairs:
        run(br, bv)
    os.environ.pop("EGOM2P_CE_BR", None)
    os.environ.pop("EGOM2P_CE_BV", None)

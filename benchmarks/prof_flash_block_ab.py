import time, functools, numpy as np
from egom2p_tpu.core.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.flash_attention import (
    BlockSizes, SegmentIds, flash_attention)

def syncarr(x):
    return np.asarray(jax.jit(lambda a: a.reshape(-1)[0])(x))

B, H, N, hd = 8, 12, 8704, 64
k0 = jax.random.PRNGKey(0)
q = jax.random.normal(k0, (B, H, N, hd), jnp.bfloat16)
k = jax.random.normal(k0, (B, H, N, hd), jnp.bfloat16)
v = jax.random.normal(k0, (B, H, N, hd), jnp.bfloat16)
seg = jnp.zeros((B, N), jnp.int32)
FL = 4 * B * H * N * N * hd

def run(bq, bk):
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
                    block_q_major_dkv=bq, block_k_major_dkv=bk,
                    block_k_dkv=bk, block_q_dkv=bq,
                    block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)
    f = jax.jit(functools.partial(flash_attention, block_sizes=bs,
                                  sm_scale=hd**-0.5))
    def g(q, k, v, seg):
        return f(q, k, v, segment_ids=SegmentIds(q=seg, kv=seg))
    g = jax.jit(g)
    out = g(q, k, v, seg); syncarr(out)
    times = []
    for _ in range(4):
        t0 = time.time(); syncarr(g(q, k, v, seg)); times.append(time.time()-t0)
    dt = min(times)*1000
    print("bq=%4d bk=%4d: %6.1f ms  %.1f TF/s" % (bq, bk, dt, FL/dt/1e9), flush=True)

import sys
for spec in sys.argv[1:]:
    bq, bk = map(int, spec.split(","))
    try: run(bq, bk)
    except Exception as e: print("bq=%d bk=%d failed: %s" % (bq, bk, str(e)[:100]), flush=True)

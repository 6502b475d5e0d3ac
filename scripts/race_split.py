import time, numpy as np, jax, jax.numpy as jnp
import aindex_tpu
rng = np.random.default_rng(7)
@jax.jit
def _csum(x): return jnp.sum(x.astype(jnp.uint64))
def bench(fn, reps=5):
    fn(); ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    return min(ts)

@jax.jit
def split2(t1, t2, i, j):
    return t1[i].sum(axis=1) + t2[j].sum(axis=1)

B, CALLS = 1 << 23, 8
for lr in (22, 23):
    rows = 1 << lr
    t1 = jax.device_put(rng.integers(0, 2**32, size=(rows, 2), dtype=np.uint32))
    t2 = jax.device_put(rng.integers(0, 2**32, size=(rows, 2), dtype=np.uint32))
    idx = [(jax.device_put(rng.integers(0, rows, size=B).astype(np.int32)),
            jax.device_put(rng.integers(0, rows, size=B).astype(np.int32)))
           for _ in range(CALLS)]
    jax.block_until_ready([t1, t2] + [a for p in idx for a in p])
    tt = bench(lambda: float(sum(_csum(split2(t1, t2, i, j)) for i, j in idx)))
    print(f"2x [B,2] from TWO [2^{lr},2] arrays ({2*rows*8/1e6:.1f} MB total): {CALLS*B/tt/1e6:7.1f} M/s", flush=True)
    del t1, t2, idx

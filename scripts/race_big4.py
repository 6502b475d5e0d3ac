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
def rowg2(tbl, i, j):
    return tbl[i].sum(axis=1) + tbl[j].sum(axis=1)
B, CALLS = 1 << 23, 8
for lr, w in ((23, 4), (24, 4), (25, 4), (24, 2)):
    rows = 1 << lr
    t = jax.device_put(rng.integers(0, 2**32, size=(rows, w), dtype=np.uint32))
    idx = [(jax.device_put(rng.integers(0, rows, size=B).astype(np.int32)),
            jax.device_put(rng.integers(0, rows, size=B).astype(np.int32)))
           for _ in range(CALLS)]
    jax.block_until_ready([t] + [a for p in idx for a in p])
    tt = bench(lambda: float(sum(_csum(rowg2(t, i, j)) for i, j in idx)))
    print(f"2x [B,{w}] rows=2^{lr} ({rows*w*4/1e6:6.1f} MB): {CALLS*B/tt/1e6:7.1f} M/s", flush=True)
    del t, idx

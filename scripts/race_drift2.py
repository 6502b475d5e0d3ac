import time, functools, numpy as np, jax, jax.numpy as jnp
import aindex_tpu

rng = np.random.default_rng(7)
@jax.jit
def _csum(x): return jnp.sum(x.astype(jnp.uint64))
def bench(fn, reps=5):
    fn(); ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); fn(); ts.append(time.perf_counter()-t0)
    return min(ts)

@functools.partial(jax.jit, static_argnames=("w",))
def rowg2(tbl, i, w):
    r1 = tbl[i]
    r2 = tbl[(i + 99991) & (tbl.shape[0] - 1)]
    return r1.sum(axis=1) + r2.sum(axis=1)

B, CALLS = 1 << 23, 8
for lr in (22, 23, 24):
    rows = 1 << lr
    t2 = jax.device_put(rng.integers(0, 2**32, size=(rows, 2), dtype=np.uint32))
    idx = [jax.device_put(rng.integers(0, rows, size=B).astype(np.int32)) for _ in range(CALLS)]
    jax.block_until_ready([t2] + idx)
    t = bench(lambda: float(sum(_csum(rowg2(t2, i, 2)) for i in idx)))
    print(f"2x[B,2] full-row rows=2^{lr}: {CALLS*B/t/1e6:7.1f} M/s", flush=True)
    del t2, idx

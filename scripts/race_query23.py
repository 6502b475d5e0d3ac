"""Race 23-mer codes-in query layouts on the real chip.

Round-5 layout hunt for the >=100M q/s/chip north star. Measures
(checksum-fenced, best-of-N, 4 pipelined 8M-key calls to amortise the
~25 ms tunnel dispatch):
  A. row-gather rate vs row width (all columns consumed)
  B. windowed flat gathers (single random access of W contiguous lanes)
  C. ALU-only canonicalise+hash cost
  D. full candidate kernels (current 16B-row cuckoo; 8B-row quotient
     cuckoo; single-probe bucketed perfect layouts)

Run: PYTHONPATH=. python scripts/race_query23.py
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp

import aindex_tpu  # noqa: F401  (enables x64)
from aindex_tpu.kernels.lookup import mix64
from aindex_tpu.kernels.encode import revcomp_code64


def bench(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


@jax.jit
def _csum(x):
    return jnp.sum(x.astype(jnp.uint64))


def timed(name, call, inputs, per_call):
    def run():
        outs = [call(i) for i in inputs]
        return float(sum(_csum(o) for o in outs))
    t = bench(run)
    rate = len(inputs) * per_call / t
    print(f"{name:48s} {rate/1e6:9.1f} M/s   ({t*1e3:7.1f} ms)", flush=True)
    return rate


MASK46 = (1 << 46) - 1


def bij46(x, mult):
    x = x ^ (x >> jnp.uint64(23))
    x = (x * jnp.uint64(mult)) & jnp.uint64(MASK46)
    x = x ^ (x >> jnp.uint64(23))
    x = (x * jnp.uint64(0x2545F4914F6CDD1D & MASK46)) & jnp.uint64(MASK46)
    x = x ^ (x >> jnp.uint64(23))
    return x


def main():
    rng = np.random.default_rng(7)
    B = 1 << 23          # 8M queries per call
    CALLS = 4
    M = 1 << 21          # half-table rows (bench-scale: n ~ 2.4M keys)
    LB = 21

    print(f"device: {jax.devices()}  B={B}  calls={CALLS}  m=2^{LB}")

    codes_np = [rng.integers(0, 1 << 46, size=B, dtype=np.uint64)
                for _ in range(CALLS)]
    codes = [jax.device_put(c) for c in codes_np]
    idx32 = [jax.device_put((c & np.uint64((2 * M) - 1)).astype(np.int32))
             for c in codes_np]
    jax.block_until_ready(codes + idx32)

    # ---- A: row gathers, every column consumed ---------------------------
    @functools.partial(jax.jit, static_argnames=("w",))
    def rowg(tbl, i, w):
        r = tbl[i]                      # [B, w]
        return r.sum(axis=1)

    @functools.partial(jax.jit, static_argnames=("w",))
    def rowg2(tbl, i, w):
        r1 = tbl[i]
        r2 = tbl[(i + 99991) & (tbl.shape[0] - 1)]
        return r1.sum(axis=1) + r2.sum(axis=1)

    for w in (1, 2, 3, 4, 8, 16, 24, 32):
        tbl = jax.device_put(
            rng.integers(0, 2**32, size=(2 * M, w), dtype=np.uint32))
        jax.block_until_ready(tbl)
        timed(f"1x [B,{w}]u32 row gather ({4*w}B)",
              lambda i, t=tbl, w=w: rowg(t, i, w), idx32, B)
        if w <= 4:
            timed(f"2x [B,{w}]u32 row gather",
                  lambda i, t=tbl, w=w: rowg2(t, i, w), idx32, B)
        del tbl

    # ---- B: windowed flat gathers ---------------------------------------
    flat = jax.device_put(
        rng.integers(0, 2**32, size=2 * M * 32, dtype=np.uint32))
    jax.block_until_ready(flat)

    @functools.partial(jax.jit, static_argnames=("w",))
    def windowg(tbl, i, w):
        start = (i.astype(jnp.int32) * 7) & (tbl.shape[0] - w - 1)
        r = tbl[start[:, None] + jnp.arange(w, dtype=jnp.int32)[None, :]]
        return r.sum(axis=1)

    for w in (8, 16, 32):
        timed(f"1x flat window gather W={w} ({4*w}B)",
              lambda i, w=w: windowg(flat, i, w), idx32, B)
    del flat

    # ---- C: ALU only -----------------------------------------------------
    @jax.jit
    def alu(c):
        rc = revcomp_code64(c, 23)
        canon = jnp.minimum(c, rc)
        h1 = bij46(canon, 0x9E3779B97F4A7C15 & MASK46)
        h2 = bij46(canon ^ jnp.uint64(MASK46), 0xC2B2AE3D27D4EB4F & MASK46)
        return (h1 ^ h2).astype(jnp.uint32)

    timed("ALU only (rc+canon+2x bij46)", alu, codes, B)

    @jax.jit
    def alu1(c):
        rc = revcomp_code64(c, 23)
        canon = jnp.minimum(c, rc)
        h1 = bij46(canon, 0x9E3779B97F4A7C15 & MASK46)
        return h1.astype(jnp.uint32)

    timed("ALU only (rc+canon+1x bij46)", alu1, codes, B)

    # ---- D: full candidate kernels --------------------------------------
    # D0: current engine (16B rows, 2 row gathers, mix64 u64 hashing)
    from aindex_tpu.index.cuckoo import cuckoo_query, _SEED1, _SEED2
    t_r4 = jax.device_put(
        rng.integers(0, 2**32, size=(2 * M, 4), dtype=np.uint32))
    jax.block_until_ready(t_r4)

    @jax.jit
    def cur(tbl, c):
        rc = revcomp_code64(c, 23)
        canon = jnp.minimum(c, rc)
        tf, _ = cuckoo_query(tbl, canon, None, np.uint64(_SEED1),
                             np.uint64(_SEED2), m=M)
        return tf

    timed("current engine (2x 16B rows) big batch",
          lambda c: cur(t_r4, c), codes, B)

    small = codes[0][: 1 << 21]
    jax.block_until_ready(small)
    one = lambda: float(_csum(cur(t_r4, small)))
    t = bench(one)
    print(f"{'current engine, 2M batch single call':48s} "
          f"{(1<<21)/t/1e6:9.1f} M/s   ({t*1e3:7.1f} ms)", flush=True)
    del t_r4

    # D1: quotient cuckoo — 2 halves, [2m,2]u32 rows (fp32, tf32)
    t_r2 = jax.device_put(
        rng.integers(0, 2**32, size=(2 * M, 2), dtype=np.uint32))
    jax.block_until_ready(t_r2)

    @jax.jit
    def quot(tbl, c):
        rc = revcomp_code64(c, 23)
        canon = jnp.minimum(c, rc)
        h1 = bij46(canon, 0x9E3779B97F4A7C15 & MASK46)
        h2 = bij46(canon ^ jnp.uint64(MASK46), 0xC2B2AE3D27D4EB4F & MASK46)
        r1 = (h1 & jnp.uint64(M - 1)).astype(jnp.int32)
        r2 = (h2 & jnp.uint64(M - 1)).astype(jnp.int32) + jnp.int32(M)
        fp1 = (h1 >> jnp.uint64(LB)).astype(jnp.uint32)
        fp2 = (h2 >> jnp.uint64(LB)).astype(jnp.uint32)
        c1 = tbl[r1]
        c2 = tbl[r2]
        hit1 = c1[:, 0] == fp1
        hit2 = c2[:, 0] == fp2
        return jnp.where(hit1, c1[:, 1], jnp.where(hit2, c2[:, 1], 0))

    timed("quotient cuckoo (2x 8B rows)", lambda c: quot(t_r2, c), codes, B)
    del t_r2

    # D2: single-probe bucket-16 (fp,tf)x16 = [m2,32]u32 128B rows
    m2 = M >> 2
    t_b16 = jax.device_put(
        rng.integers(0, 2**32, size=(m2, 32), dtype=np.uint32))
    jax.block_until_ready(t_b16)

    @jax.jit
    def bucket16(tbl, c):
        rc = revcomp_code64(c, 23)
        canon = jnp.minimum(c, rc)
        h = bij46(canon, 0x9E3779B97F4A7C15 & MASK46)
        r = (h & jnp.uint64(m2 - 1)).astype(jnp.int32)
        fp = (h >> jnp.uint64(19)).astype(jnp.uint32)
        row = tbl[r].reshape(-1, 16, 2)
        hit = row[:, :, 0] == fp[:, None]
        return jnp.where(hit.any(axis=1),
                         (row[:, :, 1] * hit).sum(axis=1), 0)

    timed("single-probe bucket16 (1x 128B row)",
          lambda c: bucket16(t_b16, c), codes, B)
    del t_b16

    # D3: single-probe bucket-8 (fp,tf)x8 = [m3,16]u32 64B rows
    m3 = M >> 1
    t_b8 = jax.device_put(
        rng.integers(0, 2**32, size=(m3, 16), dtype=np.uint32))
    jax.block_until_ready(t_b8)

    @jax.jit
    def bucket8(tbl, c):
        rc = revcomp_code64(c, 23)
        canon = jnp.minimum(c, rc)
        h = bij46(canon, 0x9E3779B97F4A7C15 & MASK46)
        r = (h & jnp.uint64(m3 - 1)).astype(jnp.int32)
        fp = (h >> jnp.uint64(20)).astype(jnp.uint32)
        row = tbl[r].reshape(-1, 8, 2)
        hit = row[:, :, 0] == fp[:, None]
        return jnp.where(hit.any(axis=1),
                         (row[:, :, 1] * hit).sum(axis=1), 0)

    timed("single-probe bucket8 (1x 64B row)",
          lambda c: bucket8(t_b8, c), codes, B)
    del t_b8

    # D4: 2-choice 2-slot buckets, [2m,4]u32 16B rows, quotiented fps
    t_q4 = jax.device_put(
        rng.integers(0, 2**32, size=(2 * M, 4), dtype=np.uint32))
    jax.block_until_ready(t_q4)

    @jax.jit
    def cq2slot(tbl, c):
        rc = revcomp_code64(c, 23)
        canon = jnp.minimum(c, rc)
        h1 = bij46(canon, 0x9E3779B97F4A7C15 & MASK46)
        h2 = bij46(canon ^ jnp.uint64(MASK46), 0xC2B2AE3D27D4EB4F & MASK46)
        r1 = (h1 & jnp.uint64(M - 1)).astype(jnp.int32)
        r2 = (h2 & jnp.uint64(M - 1)).astype(jnp.int32) + jnp.int32(M)
        fp1 = (h1 >> jnp.uint64(LB)).astype(jnp.uint32)
        fp2 = (h2 >> jnp.uint64(LB)).astype(jnp.uint32)
        c1 = tbl[r1]
        c2 = tbl[r2]
        tf = jnp.where(c1[:, 0] == fp1, c1[:, 1], 0)
        tf = jnp.where(c1[:, 2] == fp1, c1[:, 3], tf)
        tf = jnp.where(c2[:, 0] == fp2, c2[:, 1], tf)
        tf = jnp.where(c2[:, 2] == fp2, c2[:, 3], tf)
        return tf

    timed("2-choice 2-slot buckets (2x 16B rows)",
          lambda c: cq2slot(t_q4, c), codes, B)
    del t_q4


if __name__ == "__main__":
    main()

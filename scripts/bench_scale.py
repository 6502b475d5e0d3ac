"""Query + load benchmarks on the E. coli-scale artifact set
(BASELINE.json config 3; corpus from scripts/make_scale_corpus.py).

Usage: python scripts/bench_scale.py [prefix23] [prefix13]
Prints one JSON line per metric (same families as bench.py, at ~10^7
keys / ~10^8 positions instead of bench.py's 2.4M / 2.6M).
"""

import json
import os
import resource
import sys
import time

import numpy as np


def best(fn, reps=5):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    import jax
    import jax.numpy as jnp
    from aindex_tpu.api import AIndex
    from aindex_tpu.core import codec

    p23 = sys.argv[1] if len(sys.argv) > 1 else ".scale/ec.23"
    p13 = sys.argv[2] if len(sys.argv) > 2 else ".scale/ec.13"
    out = []

    def emit(metric, value, unit):
        line = {"metric": metric, "value": round(float(value), 1),
                "unit": unit}
        out.append(line)
        print(json.dumps(line), flush=True)

    rng = np.random.default_rng(5)

    # ---- load (23-mer artifact set incl. 792 MB positional CSR) ---------
    t0 = time.perf_counter()
    ai = AIndex.load_from_prefix(p23, load_reads=True)
    emit("scale_load_23mer", time.perf_counter() - t0, "s")
    sp = ai.sparse23
    n = sp.n
    print(f"# n_keys={n} positions={ai.pos23.total} "
          f"reads_mb={ai.reads.reads_size/1e6:.0f}", flush=True)

    # engine build time (quotient cuckoo at 10^7 keys)
    t0 = time.perf_counter()
    qc = sp.quot
    emit("scale_quot_build_10m_keys", time.perf_counter() - t0, "s")
    print(f"# quot lb={qc.lb} halves={2*(1<<qc.lb)*8/1e6:.0f}MB "
          f"total={qc.nbytes/1e6:.0f}MB", flush=True)

    # ---- device codes-in query at 10^7-key table ------------------------
    @jax.jit
    def _csum(x):
        return jnp.sum(x.astype(jnp.uint64))

    B, CALLS = 1 << 23, 4
    pool = jnp.asarray(sp.checker_host[
        rng.integers(0, n, size=1 << 22)])
    jax.block_until_ready(pool)

    @jax.jit
    def _sample(k):
        return pool[jax.random.randint(k, (B,), 0, pool.shape[0])]

    qk = jax.random.PRNGKey(3)
    qs = [_sample(jax.random.fold_in(qk, i)) for i in range(CALLS)]
    jax.block_until_ready(qs)

    t = best(lambda: float(sum(_csum(sp.get_tf_values_codes(c))
                               for c in qs)))
    emit("scale_23mer_codes_queries", CALLS * B / t, "queries/s/chip")

    # ---- ASCII batch query (host fused engine at scale) -----------------
    qn = 1 << 20
    kms = codec.decode_kmers(
        sp.checker_host[rng.integers(0, n, size=qn)], 23)
    t = best(lambda: int(np.asarray(ai.get_tf_values(kms))
                         .astype(np.uint64).sum()), reps=3)
    emit("scale_23mer_ascii_queries", qn / t, "queries/s")

    # ---- positions at 10^8-position CSR (batched API) -------------------
    probe = codec.decode_kmers(
        sp.checker_host[rng.integers(0, n, size=4096)], 23)
    npos = sum(len(p) for p in ai.get_positions_batch(probe))
    t = best(lambda: ai.get_positions_batch(probe), reps=3)
    emit("scale_positions", npos / t, "positions/s")

    # ---- coverage -------------------------------------------------------
    seqs = [ai.get_read_by_rid(int(r))
            for r in rng.integers(0, ai.n_reads, size=2000)]
    t = best(lambda: ai.get_sequence_coverage_batch(seqs), reps=3)
    emit("scale_coverage_23mer", len(seqs) / t, "sequences/s")

    # ---- 13-mer ---------------------------------------------------------
    if os.path.exists(p13 + ".tf.bin"):
        t0 = time.perf_counter()
        ai13 = AIndex.load_from_prefix_13mer(p13, load_aindex=True)
        emit("scale_load_13mer", time.perf_counter() - t0, "s")
        codes13 = jnp.asarray(
            rng.integers(0, 4 ** 13, size=1 << 24, dtype=np.int64)
            .astype(np.uint32))
        jax.block_until_ready(codes13)
        t = best(lambda: float(_csum(
            ai13.dense13.get_total_tf_values_codes(codes13))))
        emit("scale_13mer_codes_queries", codes13.shape[0] / t,
             "queries/s/chip")

    print(f"# peak_rss_gb="
          f"{resource.getrusage(resource.RUSAGE_SELF).ru_maxrss/1e6:.2f}",
          flush=True)


if __name__ == "__main__":
    main()

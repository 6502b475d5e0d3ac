"""Benchmark: batched 13-mer tf queries per second on one chip.

Measures the headline metric of BASELINE.md — batch k-mer frequency queries
against the dense 4^13 table (reference batch rate: 2.0M q/s,
/root/reference/README.md:480). The query is the fwd+rc total-tf form
(get_total_tf_values_13mer semantics), served by the engine's fused
tf_total table (tf_total[c] = tf[c] + tf[rc(c)]): one HBM gather per key.

Timing methodology: on this backend ``block_until_ready`` does not wait for
device completion, so every timed call folds the query batch into a scalar
checksum and forces it to host (``float(...)``); the measured host<->device
roundtrip latency of a trivial computation is subtracted. Distinct pre-staged
input batches; median over repetitions.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import statistics
import time

import numpy as np

REFERENCE_BATCH_QPS = 2.0e6  # /root/reference/README.md:480


def main():
    import jax
    import jax.numpy as jnp

    from aindex_tpu.constants import SPACE_13
    from aindex_tpu.index.dense13 import Dense13Index

    rng = np.random.default_rng(42)

    tf = jnp.asarray(rng.integers(0, 50, size=SPACE_13, dtype=np.int64)
                     .astype(np.uint32))
    # the engine's own query table (fused fwd+rc, minimal exact width)
    tf_total = Dense13Index(tf).tf_total

    batch = 1 << 22  # 4M queries per call

    @jax.jit
    def total_tf_checksum(tf_total, codes):
        vals = tf_total[codes.astype(jnp.int32)]
        # fold to a scalar so host readback proves completion
        return vals.astype(jnp.uint32).sum()

    @jax.jit
    def trivial(x):
        return x + 1

    # measure host<->device roundtrip latency
    float(trivial(jnp.uint32(1)))
    rts = []
    for _ in range(10):
        t0 = time.perf_counter()
        float(trivial(jnp.uint32(1)))
        rts.append(time.perf_counter() - t0)
    roundtrip = statistics.median(rts)

    inputs = [jnp.asarray(
        rng.integers(0, SPACE_13, size=batch, dtype=np.int64).astype(np.uint32))
        for _ in range(4)]

    # warmup / compile
    float(total_tf_checksum(tf_total, inputs[0]))

    times = []
    for i in range(15):
        codes = inputs[i % len(inputs)]
        t0 = time.perf_counter()
        float(total_tf_checksum(tf_total, codes))
        times.append(time.perf_counter() - t0)

    per_call = max(statistics.median(times) - roundtrip, 1e-9)
    qps = batch / per_call
    print(json.dumps({
        "metric": "13mer_batch_total_tf_queries",
        "value": round(qps, 1),
        "unit": "queries/s/chip",
        "vs_baseline": round(qps / REFERENCE_BATCH_QPS, 2),
    }))


if __name__ == "__main__":
    main()

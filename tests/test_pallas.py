"""Pallas shard-streaming gather kernel: correctness vs the XLA gather.

On the CPU test backend the kernel runs in interpreter mode (semantics are
identical to the compiled TPU path); ``gather_tf_auto`` must route to the
XLA gather off-TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from aindex_tpu.kernels.pallas_lookup import (LANES, SHARD_ROWS,
                                              gather_tf_auto,
                                              gather_tf_pallas)

T_SMALL = SHARD_ROWS * LANES * 2  # two shards


@pytest.fixture(scope="module")
def table_and_codes():
    rng = np.random.default_rng(20260819)
    table = rng.integers(0, 255, size=T_SMALL, dtype=np.int64).astype(np.uint8)
    codes = rng.integers(0, T_SMALL, size=70_001,
                         dtype=np.int64).astype(np.uint32)
    return jnp.asarray(table), jnp.asarray(codes), table, codes


class TestPallasGather:
    def test_matches_xla_gather(self, table_and_codes):
        table_j, codes_j, table, codes = table_and_codes
        got = np.asarray(gather_tf_pallas(table_j, codes_j, interpret=True))
        assert (got == table[codes]).all()

    def test_edge_codes(self, table_and_codes):
        table_j, _, table, _ = table_and_codes
        edges = np.array([0, 1, LANES - 1, LANES, SHARD_ROWS * LANES - 1,
                          SHARD_ROWS * LANES, T_SMALL - 1], dtype=np.uint32)
        got = np.asarray(gather_tf_pallas(table_j, jnp.asarray(edges),
                                          interpret=True))
        assert (got == table[edges]).all()

    def test_uint16_uint32_tables(self):
        rng = np.random.default_rng(3)
        codes = rng.integers(0, T_SMALL, size=9000,
                             dtype=np.int64).astype(np.uint32)
        for dt in (np.uint16, np.uint32):
            table = rng.integers(0, np.iinfo(dt).max, size=T_SMALL,
                                 dtype=np.int64).astype(dt)
            got = np.asarray(gather_tf_pallas(jnp.asarray(table),
                                              jnp.asarray(codes),
                                              interpret=True))
            assert (got == table[codes]).all()

    def test_odd_table_size_padded(self):
        """Non-shard-multiple tables are zero-padded, not rejected."""
        rng = np.random.default_rng(7)
        table = rng.integers(0, 255, size=100, dtype=np.int64).astype(np.uint8)
        codes = rng.integers(0, 100, size=64, dtype=np.int64).astype(np.uint32)
        got = np.asarray(gather_tf_pallas(jnp.asarray(table),
                                          jnp.asarray(codes), interpret=True))
        assert (got == table[codes]).all()

    def test_bad_dtype_rejected(self):
        with pytest.raises(ValueError):
            gather_tf_pallas(jnp.zeros(100, jnp.float32),
                             jnp.zeros(8, jnp.uint32), interpret=True)

    def test_auto_falls_back_off_tpu(self, table_and_codes):
        table_j, codes_j, table, codes = table_and_codes
        assert jax.default_backend() != "tpu"
        got = np.asarray(gather_tf_auto(table_j, codes_j))
        assert (got == table[codes]).all()

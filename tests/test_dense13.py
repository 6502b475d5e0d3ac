"""Golden-value parity tests for the dense 13-mer index (SURVEY.md §4 level 1:
every k-mer's tf compared against an independent Python oracle)."""

import numpy as np
import pytest

from aindex_tpu.constants import SPACE_13
from aindex_tpu.core.reads import ReadsStore
from aindex_tpu.index.dense13 import Dense13Index

import oracle


@pytest.fixture(scope="module")
def reads(request):
    rng = np.random.default_rng(20260817)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = [bytes(bases[rng.integers(0, 4, size=60)]).decode() for _ in range(40)]
    reads += ["ACGT" * 20, "AC" + "N" * 5 + "GTGT" * 15, "ACGTACGTACGTA"]
    return reads


@pytest.fixture(scope="module")
def built(reads):
    store = ReadsStore.from_sequences(reads)
    return Dense13Index.build_from_blob(store.blob), oracle.count_forward(reads, 13)


class TestCounts:
    def test_every_kmer_tf_matches_oracle(self, built):
        index, golden = built
        kmers = sorted(golden)
        tfs = index.get_tf_values(kmers)
        mismatches = [(km, int(tf), golden[km])
                      for km, tf in zip(kmers, tfs) if tf != golden[km]]
        assert mismatches == []

    def test_total_mass_matches(self, built):
        index, golden = built
        assert index.stats()["total_count"] == sum(golden.values())

    def test_absent_kmer_zero(self, built):
        index, golden = built
        absent = "G" * 13
        assert absent not in golden
        assert index.get_tf_values([absent])[0] == 0

    def test_invalid_kmer_zero(self, built):
        index, _ = built
        assert index.get_tf_values(["ACGTNACGTACGT"])[0] == 0

    def test_total_tf_is_fwd_plus_rc(self, built):
        index, golden = built
        kmers = sorted(golden)[:200]
        total = index.get_total_tf_values(kmers)
        for km, t in zip(kmers, total):
            assert t == golden.get(km, 0) + golden.get(oracle.rc(km), 0)

    def test_both_directions(self, built):
        index, golden = built
        kmers = sorted(golden)[:100]
        fwd, rev = index.get_tf_both_directions(kmers)
        for km, f, r in zip(kmers, fwd, rev):
            assert f == golden.get(km, 0)
            assert r == golden.get(oracle.rc(km), 0)

    def test_codes_api_matches_ascii_api(self, built):
        """The public codes-in entry points (device array in -> device
        uint32 out) agree with the ASCII paths on the same queries."""
        from aindex_tpu.core import codec
        index, golden = built
        kmers = sorted(golden)[:200] + ["G" * 13]
        codes, valid = codec.encode_kmers(kmers, 13)
        assert valid.all()
        got_f = np.asarray(index.get_tf_values_codes(codes))
        got_t = np.asarray(index.get_total_tf_values_codes(codes))
        assert got_f.dtype == np.uint32 and got_t.dtype == np.uint32
        np.testing.assert_array_equal(got_f, index.get_tf_values(kmers))
        np.testing.assert_array_equal(got_t, index.get_total_tf_values(kmers))
        # the valid mask zeroes masked entries
        mask = np.zeros(len(kmers), dtype=bool)
        mask[::2] = True
        got_m = np.asarray(index.get_tf_values_codes(codes, mask))
        np.testing.assert_array_equal(got_m, np.where(mask, got_f, 0))

    def test_ascii_outputs_are_uint32(self, built):
        index, golden = built
        kmers = sorted(golden)[:8]
        assert index.get_tf_values(kmers).dtype == np.uint32
        assert index.get_total_tf_values(kmers).dtype == np.uint32
        fwd, rev = index.get_tf_both_directions(kmers)
        assert fwd.dtype == np.uint32 and rev.dtype == np.uint32

    def test_chunk_boundary_invariance(self, reads):
        """Counts must not depend on the streaming chunk size (halo overlap
        correctness — the analogue of the reference's worker pull-back)."""
        store = ReadsStore.from_sequences(reads)
        a = Dense13Index.build_from_blob(store.blob, chunk=64)
        b = Dense13Index.build_from_blob(store.blob, chunk=1 << 22)
        assert (a.tf_host == b.tf_host).all()


class TestCoverage:
    def test_coverage_matches_oracle(self, built, reads):
        index, golden = built
        for seq in [reads[0], reads[-3], "ACGTN" + reads[1]]:
            cov = index.sequence_coverage(seq)
            assert list(cov) == oracle.coverage_forward(golden, seq, 13)

    def test_short_sequence(self, built):
        index, _ = built
        assert index.sequence_coverage("ACGT").size == 0

    def test_cutoff(self, built, reads):
        index, golden = built
        cov = index.sequence_coverage(reads[40], cutoff=10)  # 'ACGT'*20
        exp = [v if v >= 10 else 0
               for v in oracle.coverage_forward(golden, reads[40], 13)]
        assert list(cov) == exp


class TestPersistence:
    def test_save_load_roundtrip(self, built, tmp_path):
        index, _ = built
        path = str(tmp_path / "t.tf.bin")
        index.save(path)
        import os
        assert os.path.getsize(path) == SPACE_13 * 8  # uint64 on disk
        again = Dense13Index.load(path)
        assert (again.tf_host == index.tf_host).all()

    def test_uint32_overflow_warns_and_keeps_exact_host_table(self, caplog):
        """Counts beyond uint32 (>600 Gbp corpora): the device table
        saturates with a logged warning, the uint64 host table and save()
        stay exact (VERDICT r3 weak #6)."""
        import logging
        raw = np.zeros(SPACE_13, dtype=np.uint64)
        big = np.uint64(1) << np.uint64(33)
        raw[5] = big
        raw[7] = 3
        with caplog.at_level(logging.WARNING, "aindex_tpu.index.dense13"):
            idx = Dense13Index._from_raw_u64(raw, "synthetic")
        assert any("exceed uint32" in r.message for r in caplog.records)
        assert idx.tf_host.dtype == np.uint64
        assert idx.tf_host[5] == big                 # host: exact
        assert int(idx.tf[5]) == np.iinfo(np.uint32).max  # device: saturated
        assert int(idx.tf[7]) == 3
        # unsaturated tables load silently as uint32
        caplog.clear()
        idx2 = Dense13Index._from_raw_u64(raw * 0 + 2, "synthetic")
        assert idx2.tf_host.dtype == np.uint32 and not caplog.records

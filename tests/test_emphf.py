"""Bit-level interop with the reference C++ artifact formats.

``tests/golden_ref/`` holds an index artifact set produced by the unmodified
reference pipeline (see its README for provenance). These tests prove:

* our emphf `.pf` reader reproduces the reference's MPHF lookups exactly;
* a `.pf` we *write* has the exact reference byte layout (load -> save of the
  golden file is byte-identical);
* a full reference prefix loads through the public API with correct tf,
  positions, and reads;
* `export_reference` emits an artifact set that round-trips through the
  emphf path with identical query results.
"""

import os

import numpy as np
import pytest

from aindex_tpu.core import codec
from aindex_tpu.index.emphf import (EmphfMPHFAdapter, EmphfPF,
                                    dense_slot_permutation,
                                    jenkins_triple_codes, unpermute_dense_tf)
from aindex_tpu.index.positional import PositionalIndex
from aindex_tpu.index.sparse23 import Sparse23Index

GOLD = os.path.join(os.path.dirname(__file__), "golden_ref")
PREFIX = os.path.join(GOLD, "p.23")


@pytest.fixture(scope="module")
def golden_pf():
    return EmphfPF.load(PREFIX + ".pf")


@pytest.fixture(scope="module")
def golden_arrays():
    checker = np.fromfile(PREFIX + ".kmers.bin", dtype=np.uint64)
    tf = np.fromfile(PREFIX + ".tf.bin", dtype=np.uint32)
    return checker, tf


@pytest.fixture(scope="module")
def golden_dat():
    out = {}
    with open(PREFIX + ".dat") as f:
        for line in f:
            km, cnt = line.split()
            out[km] = int(cnt)
    return out


class TestEmphfReader:
    def test_lookup_bijection_on_golden(self, golden_pf, golden_arrays):
        """Every kmer stored at reference slot s must hash back to s —
        proves the Jenkins triple + bitpair walk is bit-exact."""
        checker, _ = golden_arrays
        assert checker.size == golden_pf.n
        slots = golden_pf.lookup_codes(checker, 23)
        assert (slots == np.arange(golden_pf.n)).all()

    def test_tf_parity_vs_dat(self, golden_pf, golden_arrays, golden_dat):
        _, tf = golden_arrays
        kms = list(golden_dat)
        codes, _ = codec.encode_kmers(kms, 23)
        slots = golden_pf.lookup_codes(codes, 23)
        assert all(tf[s] == golden_dat[km] for s, km in zip(slots, kms))

    def test_save_is_byte_identical(self, golden_pf, tmp_path):
        """load -> save reproduces the reference file byte for byte
        (words AND the recomputed block-rank directory)."""
        out = tmp_path / "resaved.pf"
        golden_pf.save(str(out))
        assert out.read_bytes() == open(PREFIX + ".pf", "rb").read()

    def test_jenkins_block_path(self):
        """k >= 24 exercises the 24-byte block loop; cross-check the split
        against a straightforward single-call reimplementation via k=23 tail
        consistency: identical prefixes of < 24 bytes must hash differently
        once the length differs (sanity), and lookups must stay in range."""
        rng = np.random.default_rng(5)
        for k in (24, 31, 32):
            codes = rng.integers(0, 1 << (2 * k) if k < 32 else (1 << 63),
                                 size=64, dtype=np.int64).astype(np.uint64)
            a, b, c = jenkins_triple_codes(codes, k, seed=12345)
            assert a.shape == (64,) and b.dtype == np.uint64 and c.dtype == np.uint64

    def test_jenkins_numpy_native_parity_block_path(self):
        """The numpy and native-C Jenkins twins must agree bit for bit on
        the >=24-byte block path too (the 64-element batches above stay
        under the 65536-element native dispatch threshold, so this is the
        only direct cross-check of that path)."""
        from aindex_tpu import native
        if not native.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(11)
        for k in (24, 31, 32):
            hi = (1 << (2 * k)) if k < 32 else (1 << 63)
            codes = rng.integers(0, hi, size=257, dtype=np.int64
                                 ).astype(np.uint64)
            np_trip = jenkins_triple_codes(codes, k, seed=987654321)
            c_trip = native.jenkins_triple_codes(codes, k, 987654321)
            for a, b in zip(np_trip, c_trip):
                np.testing.assert_array_equal(a, b)


class TestEmphfExactBuild:
    def test_rebuilds_golden_pf_byte_identical(self, golden_dat, tmp_path):
        """build_exact is a bit-exact twin of compute_mphf_seq: same
        mt19937_64(37) seed draws (trial 0 fails for this key set, exactly
        as in the reference run — the golden seed is draw 1), same
        sequential peel order, same assignment. Rebuilding from the golden
        key set reproduces tests/golden_ref/p.23.pf byte for byte.
        (scripts/regen_golden13.py proves the same at full 4^13 scale.)"""
        codes, _ = codec.encode_kmers(list(golden_dat), 23)
        pf = EmphfPF.build_exact(codes, 23)
        out = tmp_path / "rebuilt.pf"
        pf.save(str(out))
        assert out.read_bytes() == open(PREFIX + ".pf", "rb").read()

    def test_key_order_does_not_matter(self, golden_dat, rng, tmp_path):
        """Construction depends only on the key SET (XOR adjacency is
        insertion-order-independent) — shuffled input, identical bytes."""
        codes, _ = codec.encode_kmers(list(golden_dat), 23)
        pf = EmphfPF.build_exact(codes[rng.permutation(len(codes))], 23)
        out = tmp_path / "shuffled.pf"
        pf.save(str(out))
        assert out.read_bytes() == open(PREFIX + ".pf", "rb").read()

    def test_python_fallback_matches_native(self, golden_dat, monkeypatch):
        from aindex_tpu import native
        codes, _ = codec.encode_kmers(list(golden_dat), 23)
        a = EmphfPF.build_exact(codes, 23)
        monkeypatch.setattr(native, "available", lambda: False)
        b = EmphfPF.build_exact(codes, 23)
        assert a.seed == b.seed and (a.values == b.values).all()


class TestEmphfBuild:
    def test_build_roundtrip(self, tmp_path, rng):
        codes = np.unique(rng.integers(0, 1 << 46, size=500).astype(np.uint64))
        pf = EmphfPF.build(codes, 23)
        slots = pf.lookup_codes(codes, 23)
        assert sorted(slots) == list(range(len(codes)))
        path = tmp_path / "built.pf"
        pf.save(str(path))
        assert EmphfPF.is_emphf_file(str(path))
        re = EmphfPF.load(str(path))
        assert (re.lookup_codes(codes, 23) == slots).all()
        assert re.seed == pf.seed and re.domain == pf.domain

    def test_is_emphf_file_rejects_atpf(self, tmp_path):
        from aindex_tpu.index.mphf import MPHF
        m = MPHF.build(np.array([1, 2, 3, 4, 5], dtype=np.uint64))
        path = tmp_path / "own.pf"
        m.save(str(path))
        assert not EmphfPF.is_emphf_file(str(path))


class TestReferencePrefixLoad:
    def test_sparse23_load_reference_prefix(self, golden_dat):
        """Sparse23Index.load auto-detects the emphf .pf and serves the
        reference's slot ids and tf values."""
        idx = Sparse23Index.load(PREFIX)
        assert isinstance(idx.mphf, EmphfMPHFAdapter)
        kms = list(golden_dat)
        tf = idx.get_tf_values(kms)
        assert list(tf) == [golden_dat[km] for km in kms]
        # slot ids ARE the reference's: each .dat key is a stored (forward)
        # key, so its pfid's checker entry is the key itself
        pfids = idx.get_pfids(kms)
        checker = np.fromfile(PREFIX + ".kmers.bin", dtype=np.uint64)
        codes, _ = codec.encode_kmers(kms, 23)
        assert (checker[pfids] == codes).all()
        # and the revcomp of each stored key resolves to the same slot
        rcs = [codec.revcomp(km) for km in kms]
        assert (idx.get_pfids(rcs) == pfids).all()

    def test_both_directions_golden(self, golden_dat):
        """get_tf_both_directions_23mer returns (tf, tf) for any present
        k-mer: the reference's per-direction probe independently applies
        fwd-else-rc (/root/reference/src/python_wrapper.cpp:610-627), so
        both direction probes of :1258-1273 find the same stored entry.
        Pinned against the reference-built golden artifacts."""
        idx = Sparse23Index.load(PREFIX)
        kms = list(golden_dat)
        rcs = [codec.revcomp(km) for km in kms]
        absent = ["A" * 23, "ACGT" * 5 + "ACG"]
        want = np.array([golden_dat[km] for km in kms], dtype=np.uint64)
        for batch in (kms, rcs):
            fwd, rev = idx.get_tf_both_directions(batch)
            np.testing.assert_array_equal(np.asarray(fwd, np.uint64), want)
            np.testing.assert_array_equal(np.asarray(rev, np.uint64), want)
        fwd, rev = idx.get_tf_both_directions(absent)
        assert not fwd.any() and not rev.any()

    def test_api_load_from_prefix_with_positions(self, golden_dat):
        """The reference's aindex fill verifies the TRUE-canonical form
        against the checker (/root/reference/src/hash.cpp:960-1060), while
        its counter stored buggy-canonical keys — so a slot's recorded
        positions are exactly the text occurrences whose true-canonical form
        equals the stored key (and slots holding alien keys stay empty).
        Loading the golden artifacts must reproduce that behavior exactly."""
        from aindex_tpu import AIndex
        ai = AIndex.load_from_prefix(PREFIX, load_reads=True)
        reads_blob = open(os.path.join(GOLD, "p.reads")).read()

        def occurrences(km):
            out = set()
            for probe in {km, codec.revcomp(km)}:
                start = 0
                while True:
                    i = reads_blob.find(probe, start)
                    if i < 0:
                        break
                    out.add(i)
                    start = i + 1
            return out

        n_filled = 0
        for km in golden_dat:
            want = {p for p in occurrences(km)
                    if min(km, codec.revcomp(km)) == km}
            got = set(ai.get_positions(km))
            assert got == want, km
            n_filled += bool(want)
        assert n_filled == 81  # what the reference pipeline actually recorded
        assert ai[next(iter(golden_dat))] == 1
        # rid resolution against the golden .ridx
        rid, read = next(ai.iter_reads())
        assert ai.get_rid(0) == 0 and len(read) == 81


class TestExportReference:
    def test_export_then_reload(self, tmp_path, rng):
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        reads = [bytes(bases[rng.integers(0, 4, size=60)]).decode()
                 for _ in range(20)]
        idx = Sparse23Index.build_from_sequences(reads)
        prefix = str(tmp_path / "exported.23")
        idx.export_reference(prefix)
        assert EmphfPF.is_emphf_file(prefix + ".pf")
        re = Sparse23Index.load(prefix)
        assert isinstance(re.mphf, EmphfMPHFAdapter)
        kms = [r[:23] for r in reads] + [r[10:33] for r in reads]
        assert list(re.get_tf_values(kms)) == list(idx.get_tf_values(kms))
        # exported arrays are internally consistent in reference slot order
        checker = np.fromfile(prefix + ".kmers.bin", dtype=np.uint64)
        pf = EmphfPF.load(prefix + ".pf")
        assert (pf.lookup_codes(checker, 23) == np.arange(pf.n)).all()

    def test_export_of_reference_loaded_index_is_stable(self, tmp_path):
        idx = Sparse23Index.load(PREFIX)
        prefix = str(tmp_path / "restamp.23")
        idx.export_reference(prefix)
        assert open(prefix + ".pf", "rb").read() == \
            open(PREFIX + ".pf", "rb").read()
        assert (np.fromfile(prefix + ".tf.bin", np.uint32)
                == np.fromfile(PREFIX + ".tf.bin", np.uint32)).all()


class TestDenseUnpermute:
    def test_small_k_roundtrip(self, rng):
        """Synthesise a 'reference-style' dense table for k=5 (4^5 = 1024):
        build an emphf MPHF over ALL 5-mers, permute a code-ordered table
        into slot order, and check unpermute_dense_tf restores it."""
        k, space = 5, 4 ** 5
        codes = np.arange(space, dtype=np.uint64)
        pf = EmphfPF.build(codes, k)
        tf_code = rng.integers(0, 1000, size=space).astype(np.uint64)
        slot_of_code = dense_slot_permutation(pf, k, chunk=300)
        tf_slot = np.zeros(space, dtype=np.uint64)
        tf_slot[slot_of_code] = tf_code
        assert (unpermute_dense_tf(tf_slot, pf, k) == tf_code).all()

    def test_positional_reorder(self, rng):
        slots = rng.integers(0, 16, size=200).astype(np.int64)
        pos0 = rng.integers(0, 10000, size=200).astype(np.int64)
        pi = PositionalIndex.from_slot_positions(slots, pos0, 16)
        perm = rng.permutation(16).astype(np.int64)
        re = pi.reorder(perm)
        for j in range(16):
            assert (re.positions_by_slot(j) == pi.positions_by_slot(int(perm[j]))).all()

"""API facade tests: dict protocol, dispatch, iterators, read resolution
(mirroring the reference's functionality test surface, SURVEY.md §4)."""

import numpy as np
import pytest

from aindex_tpu import AIndex, get_revcomp, hamming_distance

import oracle


@pytest.fixture(scope="module")
def reads():
    rng = np.random.default_rng(55)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = [bytes(bases[rng.integers(0, 4, size=64)]).decode() for _ in range(20)]
    reads.append(reads[0][:32] + "~" + get_revcomp(reads[1][:32]))  # PE read
    return reads


@pytest.fixture(scope="module")
def idx13(reads):
    return AIndex.build_from_sequences(reads, kmer_size=13)


@pytest.fixture(scope="module")
def idx23(reads):
    return AIndex.build_from_sequences(reads, kmer_size=23)


class TestDictProtocol:
    def test_getitem_contains_get(self, idx13, reads):
        km = reads[0][:13]
        golden = oracle.count_forward(reads, 13)
        assert idx13[km] == golden[km]
        assert km in idx13
        assert idx13.get("G" * 13, -1) in (-1, idx13["G" * 13] or -1)

    def test_len(self, idx13, idx23):
        assert len(idx13) == 4 ** 13
        assert len(idx23) == idx23.sparse23.n


class TestDispatch:
    def test_tf_dispatch_by_length(self, idx13, idx23, reads):
        g13 = oracle.count_forward(reads, 13)
        g23 = oracle.count_canonical(reads, 23)
        km13, km23 = reads[2][:13], reads[2][:23]
        assert idx13.get_tf_value(km13) == g13[km13]
        assert idx23.get_tf_value(km23) == g23[min(km23, oracle.rc(km23))]

    def test_wrong_length_returns_zero(self, idx13):
        assert idx13.get_tf_value("ACGT") == 0

    def test_coverage_dispatch(self, idx13, idx23, reads):
        g13 = oracle.count_forward(reads, 13)
        assert idx13.get_sequence_coverage(reads[0], k=13) == \
            oracle.coverage_forward(g13, reads[0], 13)
        g23 = oracle.count_canonical(reads, 23)
        assert idx23.get_sequence_coverage(reads[0], k=23) == \
            oracle.coverage_canonical(g23, reads[0], 23)


class TestPositionsAndReads:
    def test_rid2poses(self, idx23, reads):
        km = reads[3][10:33]
        poses = idx23.get_rid2poses(km)
        assert poses, "kmer from read 3 must be found"
        blob = oracle.blob_of(reads)
        for rid, offsets in poses.items():
            start = int(idx23.reads.starts[rid])
            for off in offsets:
                window = blob[start + off:start + off + 23]
                assert window in (km, oracle.rc(km))

    def test_get_reads_by_kmer(self, idx23, reads):
        km = reads[3][10:33]
        hits = idx23.get_reads_by_kmer(km)
        assert any(km in h or oracle.rc(km) in h for h in hits)

    def test_iter_reads(self, idx13, reads):
        got = list(idx13.iter_reads())
        assert got[0] == (0, reads[0])
        assert len(got) == len(reads)

    def test_iter_reads_se_splits_pairs(self, idx13, reads):
        rows = list(idx13.iter_reads_se())
        # the PE read contributes two subreads
        pe_rows = [r for r in rows if r[0] == len(reads) - 1]
        assert len(pe_rows) == 2
        assert pe_rows[0][2] == reads[0][:32]


class TestFrequencyTools:
    def test_iter_kmers_by_frequency_sorted(self, idx23):
        out = list(idx23.iter_kmers_by_frequency(max_kmers=20))
        tfs = [t for _, t in out]
        assert tfs == sorted(tfs, reverse=True)

    def test_top_kmers_match_oracle_max(self, idx23, reads):
        golden = oracle.count_canonical(reads, 23)
        top = idx23.get_top_kmers(1)[0]
        assert top[1] == max(golden.values())

    def test_frequency_stats(self, idx13, reads):
        golden = oracle.count_forward(reads, 13)
        s = idx13.get_kmer_frequency_stats()
        assert s["total_tf"] == sum(golden.values())
        assert s["non_zero_kmers"] == len(golden)


class TestLoadFromPrefix:
    def test_autodetect_13(self, idx13, tmp_path, reads):
        prefix = str(tmp_path / "x.13")
        idx13.dense13.save(prefix + ".tf.bin")
        idx13.pos13.save(prefix)
        idx13.reads.save(prefix)
        again = AIndex.load_from_prefix(prefix, load_reads=True)
        km = reads[0][:13]
        assert again[km] == idx13[km]
        assert again.get_positions(km) == idx13.get_positions(km)
        assert again.n_reads == len(reads)

    def test_autodetect_23(self, idx23, tmp_path, reads):
        prefix = str(tmp_path / "x.23")
        idx23.sparse23.save(prefix)
        idx23.pos23.save(prefix)
        again = AIndex.load_from_prefix(prefix)
        km = reads[0][:23]
        assert again[km] == idx23[km]

    def test_missing_prefix_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            AIndex.load_from_prefix(str(tmp_path / "nope"))

    def test_load_hash_explicit_paths(self, idx23, tmp_path, reads):
        """load_hash / load_hash_file (aindex/core/aindex.py:63-100):
        explicit artifact paths, kmers_text validated-if-given, unused."""
        prefix = str(tmp_path / "h.23")
        idx23.sparse23.save(prefix)
        again = AIndex()
        again.load_hash(prefix + ".pf", prefix + ".tf.bin",
                        prefix + ".kmers.bin")
        km = reads[0][:23]
        assert again[km] == idx23[km]
        with pytest.raises(FileNotFoundError):
            AIndex().load_hash(prefix + ".pf", prefix + ".tf.bin",
                               prefix + ".kmers.bin",
                               str(tmp_path / "missing.txt"))
        with pytest.raises(FileNotFoundError):
            AIndex().load_hash_file(str(tmp_path / "no.pf"),
                                    prefix + ".tf.bin",
                                    prefix + ".kmers.bin")


class TestHelpers:
    def test_get_revcomp(self):
        assert get_revcomp("ACGT") == "ACGT"
        assert get_revcomp("AAGG") == "CCTT"

    def test_hamming(self):
        assert hamming_distance("AAAA", "AATA") == 1


class TestBatchCoverage:
    def test_batch_matches_single(self, idx13, idx23, reads):
        seqs = reads[:5] + ["ACG", reads[0][:20] + "N" + reads[1]]
        for idx, k in ((idx13, 13), (idx23, 23)):
            batch = idx.get_sequence_coverage_batch(seqs, k=k)
            single = [idx.get_sequence_coverage(s, k=k) for s in seqs]
            assert batch == single


class TestParityTail:
    def test_mixed_length_batch_rejected(self, idx13):
        with pytest.raises(ValueError, match="mixed"):
            idx13.get_tf_values(["A" * 13, "A" * 23])

    def test_rid2poses_complete_by_default_cap_opt_in(self, reads):
        """Hub k-mers return EVERY position unless the caller passes an
        explicit max_tf (r4 silently applied the loader's max_tf; the cap
        is now opt-in per call)."""
        # duplicate one read many times so its k-mers have high fan-out
        many = [reads[0]] * 50
        idx = AIndex.build_from_sequences(many, kmer_size=23)
        km = reads[0][:23]
        idx.max_tf = 7  # the loader's stored value must NOT truncate
        full = idx.get_rid2poses(km)
        assert sum(len(v) for v in full.values()) == 50
        capped = idx.get_rid2poses(km, max_tf=7)
        assert sum(len(v) for v in capped.values()) == 7

    def test_debug_kmer_tf_values(self, idx13, idx23):
        # probe the slots that actually exist in these tiny indexes
        n23 = sum(idx23.debug_kmer_tf_values(slots=[0, 1, 2, 3]) for _ in (0,))
        assert n23 > 0
        codes = [int(c) for c in
                 np.flatnonzero(idx13.dense13.tf_host > 0)[:4]]
        n13 = idx13.debug_kmer_tf_values(slots=codes)
        assert n13 > 0

    def test_emphf_k_over_30_rejected_at_load(self):
        from aindex_tpu.index.emphf import EmphfMPHFAdapter
        from aindex_tpu.index.sparse23 import Sparse23Index
        keys = np.arange(8, dtype=np.uint64)
        adapter = EmphfMPHFAdapter.build(keys, 31)
        checker = np.zeros(adapter.n, np.uint64)
        tf = np.zeros(adapter.n, np.uint32)
        with pytest.raises(ValueError, match="k > 30|k=31"):
            Sparse23Index(adapter, checker, tf, k=31)


class TestWrapperSurfaceTail:
    """The remaining AindexWrapper-bound names (VERDICT round-2 row 19),
    /root/reference/src/python_wrapper.cpp binding block."""

    def test_revcomp_helpers(self, idx23):
        assert idx23.get_reverse_complement_23mer("A" * 23) == "T" * 23
        assert idx23.get_reverse_complement_13mer("ACGTACGTACGTA") == \
            get_revcomp("ACGTACGTACGTA")

    def test_tf_values_23mer_and_totals(self, idx23, reads):
        km = reads[0][:23]
        tf = idx23[km]
        assert idx23.get_tf_values_23mer([km]) == [tf]
        assert idx23.get_total_tf_value_23mer(km) == 2 * tf
        assert idx23.get_total_tf_values_23mer([km, "N" * 23]) == [2 * tf, 0]

    def test_explicit_file_load(self, idx23, tmp_path, reads):
        prefix = str(tmp_path / "x.23")
        idx23.sparse23.save(prefix)
        idx23.pos23.save(prefix)
        idx23.reads.save(prefix)
        again = AIndex()
        again.load(prefix + ".pf", prefix + ".tf.bin", prefix + ".kmers.bin")
        again.load_aindex_from_prefix_23mer(prefix, max_tf=50,
                                            reads_file=prefix + ".reads")
        km = reads[0][:23]
        assert again[km] == idx23[km]
        assert again.get_positions(km) == idx23.get_positions(km)
        assert again.max_tf == 50

    def test_prefix_loaders(self, idx13, idx23, tmp_path, reads):
        p13 = str(tmp_path / "p.13")
        idx13.dense13.save(p13 + ".tf.bin")
        idx13.pos13.save(p13)
        a13 = AIndex.load_from_prefix_13mer(p13)
        km = reads[0][:13]
        assert a13[km] == idx13[km]
        p23 = str(tmp_path / "p.23")
        idx23.sparse23.save(p23)
        idx23.pos23.save(p23)
        a23 = AIndex.load_from_prefix_23mer(p23, max_tf=7)
        assert a23[reads[0][:23]] == idx23[reads[0][:23]]
        assert a23.max_tf == 7

    def test_load_reads_index(self, idx23, tmp_path, reads):
        prefix = str(tmp_path / "r")
        idx23.reads.save(prefix)
        idx23.load_reads_in_memory(prefix + ".reads")
        idx23.load_reads_index(prefix + ".ridx")
        assert idx23.get_read_by_rid(0) == reads[0]

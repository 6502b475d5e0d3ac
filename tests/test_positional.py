"""Parity tests for the positional index (aindex): k-mer -> blob positions."""

import numpy as np
import pytest

from aindex_tpu.core import codec
from aindex_tpu.core.reads import ReadsStore
from aindex_tpu.index.positional import PositionalIndex
from aindex_tpu.index.sparse23 import Sparse23Index

import oracle


@pytest.fixture(scope="module")
def reads():
    rng = np.random.default_rng(123)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    reads = [bytes(bases[rng.integers(0, 4, size=50)]).decode() for _ in range(25)]
    reads += ["ACGT" * 15, "AAA" + "N" * 2 + "ACGTACGTACGTACGTACGTACGTT"]
    return reads


@pytest.fixture(scope="module")
def store(reads):
    return ReadsStore.from_sequences(reads)


class TestDense13Positions:
    def test_positions_match_oracle(self, reads, store):
        pos_index = PositionalIndex.build_dense13(store.blob)
        golden = oracle.positions_forward(reads, 13)
        for km, positions in sorted(golden.items())[:300]:
            code = codec.encode_kmer(km)
            got = [int(p) for p in pos_index.positions_by_slot(code)]
            assert got == positions, km

    def test_total_positions(self, reads, store):
        pos_index = PositionalIndex.build_dense13(store.blob)
        golden = oracle.positions_forward(reads, 13)
        assert pos_index.total == sum(len(v) for v in golden.values())

    def test_chunk_invariance(self, store):
        a = PositionalIndex.build_dense13(store.blob, chunk=100)
        b = PositionalIndex.build_dense13(store.blob)
        assert (a.positions == b.positions).all()
        assert (a.offsets == b.offsets).all()


class TestSparse23Positions:
    @pytest.fixture(scope="class")
    def built(self, reads, store):
        index = Sparse23Index.build_from_blob(store.blob)
        pos_index = PositionalIndex.build_sparse23(store.blob, index)
        return index, pos_index

    def test_positions_match_oracle(self, reads, built):
        index, pos_index = built
        golden = oracle.positions_canonical(reads, 23)
        for km, positions in sorted(golden.items())[:300]:
            slot = int(index.get_pfids([km])[0])
            got = [int(p) for p in pos_index.positions_by_slot(slot)]
            assert got == positions, km

    def test_tf_equals_position_count(self, built):
        """len(get_positions(kmer)) == tf — the reference's own invariant
        (test strategy, SURVEY.md §4)."""
        index, pos_index = built
        counts = np.diff(pos_index.offsets.astype(np.int64))
        assert (counts == index.tf_host.astype(np.int64)).all()


class TestPersistence:
    def test_save_load(self, store, tmp_path):
        pos_index = PositionalIndex.build_dense13(store.blob)
        prefix = str(tmp_path / "p.13")
        pos_index.save(prefix)
        again = PositionalIndex.load(prefix + ".index.bin", prefix + ".indices.bin")
        assert (again.positions == pos_index.positions).all()
        assert (again.offsets == pos_index.offsets).all()


class TestReadsStore:
    def test_rid_by_pos(self, reads, store):
        for rid in [0, 5, len(reads) - 1]:
            start = int(store.starts[rid])
            end = int(store.ends[rid])
            assert store.rid_by_pos(start) == rid
            assert store.rid_by_pos(end - 1) == rid

    def test_get_read_roundtrip(self, reads, store):
        for rid, read in enumerate(reads):
            assert store.get_read_by_rid(rid) == read

    def test_revcomp_read(self, reads, store):
        assert store.get_read(0, 10, rc=True) == oracle.rc(reads[0][:10])

    def test_save_load(self, store, tmp_path, reads):
        prefix = str(tmp_path / "r")
        store.save(prefix)
        again = ReadsStore.from_reads_file(prefix + ".reads", prefix + ".ridx")
        assert again.n_reads == store.n_reads
        assert again.get_read_by_rid(3) == reads[3]


class TestDeviceStreamingBuild:
    def test_device_matches_host_path(self, store):
        """The streaming device scatter equals the host argsort oracle."""
        import jax.numpy as jnp
        from aindex_tpu.core.reads import blob_chunks
        from aindex_tpu.kernels.encode import ascii_to_base_codes, window_codes
        slot_parts, pos_parts = [], []
        for piece, off in blob_chunks(store.blob, 13, 1 << 12):
            base = ascii_to_base_codes(jnp.asarray(piece))
            codes, valid = window_codes(base, 13, out_dtype=jnp.uint32)
            v = np.asarray(valid)
            slot_parts.append(np.asarray(codes)[v].astype(np.int64))
            pos_parts.append(np.flatnonzero(v).astype(np.int64) + off)
        host = PositionalIndex.from_slot_positions(
            np.concatenate(slot_parts), np.concatenate(pos_parts), 4 ** 13)
        dev = PositionalIndex.build_dense13(store.blob, chunk=1 << 12)
        assert (host.offsets == dev.offsets).all()
        assert (host.positions == dev.positions).all()

    def test_positions_sorted_within_slot(self, store):
        dev = PositionalIndex.build_dense13(store.blob, chunk=1 << 12)
        off = dev.offsets.astype(np.int64)
        for slot in np.flatnonzero(np.diff(off) > 1)[:50]:
            seg = dev.positions[off[slot]:off[slot + 1]]
            assert (np.diff(seg.astype(np.int64)) > 0).all()


class TestBatchPositions:
    def test_positions_by_slots_matches_scalar(self, store):
        dev = PositionalIndex.build_dense13(store.blob)
        rng = np.random.default_rng(5)
        nz = np.flatnonzero(np.diff(dev.offsets.astype(np.int64)))
        slots = np.concatenate([nz[:200], rng.integers(0, 4 ** 13, 50),
                                [-1, 4 ** 13 + 5]]).astype(np.int64)
        flat, lens = dev.positions_by_slots(slots)
        assert lens.sum() == flat.size
        parts = np.split(flat, np.cumsum(lens)[:-1])
        for s, got in zip(slots, parts):
            want = dev.positions_by_slot(int(s))
            assert (got == want).all(), s

    def test_api_get_positions_batch(self, reads):
        from aindex_tpu.api import AIndex
        idx = AIndex.build_from_sequences(reads, kmer_size=23)
        kmers = [r[:23] for r in reads[:20]] + ["N" * 23]
        batch = idx.get_positions_batch(kmers)
        single = [idx.get_positions(km) for km in kmers]
        assert batch == single

"""Native C++ host runtime: parity with the pure-Python fallbacks."""

import os

import numpy as np
import pytest

from aindex_tpu import native
from aindex_tpu.index.mphf import MPHF
from aindex_tpu.io import fastq as io_fastq

DATA = os.path.join(os.path.dirname(__file__), "data")

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


class TestNativeMPHF:
    def test_bijection(self, rng):
        keys = np.unique(rng.integers(0, 2**46, size=20000).astype(np.uint64))
        mphf = MPHF.build(keys, use_native=True)
        assert sorted(mphf.lookup(keys)) == list(range(len(keys)))

    def test_matches_python_build(self, rng):
        """Native and numpy peelers share the hash triple, so peelability —
        a property of the hypergraph, not the peel order — is identical:
        both succeed on the same (seed, domain). The g assignment may differ
        (different peel orders pick different owner nodes) but both must be
        bijections, and artifacts from either load interchangeably."""
        keys = np.unique(rng.integers(0, 2**46, size=3000).astype(np.uint64))
        a = MPHF.build(keys, use_native=True)
        b = MPHF.build(keys, use_native=False)
        assert a.seed == b.seed and a.domain == b.domain
        assert sorted(a.lookup(keys)) == list(range(len(keys)))
        assert sorted(b.lookup(keys)) == list(range(len(keys)))

    def test_large(self, rng):
        keys = np.unique(rng.integers(0, 2**60, size=200000).astype(np.uint64))
        mphf = MPHF.build(keys, use_native=True)
        slots = mphf.lookup(keys)
        assert len(np.unique(slots)) == len(keys)
        assert slots.max() == len(keys) - 1


class TestNativeComputeReads:
    @pytest.mark.parametrize("case", ["fastq", "se", "fasta", "reads"])
    def test_matches_python(self, tmp_path, case):
        if case == "fastq":
            args = (f"{DATA}/test_R1.fastq", f"{DATA}/test_R2.fastq", "fastq")
        elif case == "se":
            args = (f"{DATA}/test_se.fastq", None, "se")
        elif case == "fasta":
            args = (f"{DATA}/test.fasta", None, "fasta")
        else:
            args = (f"{DATA}/test_reads.txt", None, "reads")
        py_prefix = str(tmp_path / "py")
        nat_prefix = str(tmp_path / "nat")
        r_py = io_fastq.compute_reads(*args, py_prefix, use_native=False)
        r_nat = io_fastq.compute_reads(*args, nat_prefix, use_native=True)
        assert r_py["n_reads"] == r_nat["n_reads"]
        assert open(py_prefix + ".reads", "rb").read() == \
            open(nat_prefix + ".reads", "rb").read()
        assert open(py_prefix + ".ridx").read() == open(nat_prefix + ".ridx").read()
        if case == "fasta":
            assert open(py_prefix + ".header").read() == \
                open(nat_prefix + ".header").read()


class TestScanNewlines:
    def test_matches_numpy(self):
        blob = np.frombuffer(b"ACGT\nTT\n\nGGG", dtype=np.uint8)
        out = native.scan_newlines_native(blob)
        assert out is not None
        starts, ends = out
        assert list(starts) == [0, 5, 8, 9]
        assert list(ends) == [4, 7, 8, 12]


class TestNativeQueryEngine:
    """The fused host query path (encode_kmers_2bit / sparse_query_ascii)
    must mirror the staged numpy engine bit for bit."""

    def _kmers(self, rng, n, k, with_edge=True):
        bases = "ACGT"
        out = ["".join(rng.choice(list(bases)) for _ in range(k))
               for _ in range(n)]
        if with_edge:
            out += ["T" * k, "ACGN" + "A" * (k - 4), "acgt" + "A" * (k - 4)]
        return out

    def test_encode_matches_codec(self):
        import random
        from aindex_tpu.core import codec
        rng = random.Random(3)
        for k in (13, 23, 17):
            kmers = self._kmers(rng, 200, k)
            raw = "".join(kmers).encode("ascii")
            out = native.encode_kmers_2bit(raw, len(kmers), k)
            assert out is not None
            codes_n, valid_n = out
            codes_p, valid_p = codec.encode_kmers(kmers, k)
            np.testing.assert_array_equal(valid_n, valid_p)
            # codes for invalid k-mers are unspecified junk in both engines
            np.testing.assert_array_equal(codes_n[valid_n], codes_p[valid_p])

    def test_sparse_query_matches_numpy_engine(self):
        import random
        from aindex_tpu.core import codec
        from aindex_tpu.core.reads import ReadsStore
        from aindex_tpu.index.sparse23 import Sparse23Index
        rng = random.Random(11)
        reads = ["".join(rng.choice("ACGT") for _ in range(70))
                 for _ in range(25)]
        store = ReadsStore.from_sequences(reads)
        index = Sparse23Index.build_from_blob(store.blob)
        q = [r[s:s + 23] for r in reads for s in (0, 17, 40)]
        q += [codec.revcomp(q[0]), "G" * 23, "ACGTN" + "A" * 18]
        raw = "".join(q).encode("ascii")
        out = index._query_host_ascii(raw, len(q))
        assert out is not None
        tf_n, slot_n, strand_n = out
        codes, valid = codec.encode_kmers(q, 23)
        tf_p, slot_p, strand_p = index._resolve_host(codes, valid)
        np.testing.assert_array_equal(tf_n, tf_p)
        np.testing.assert_array_equal(slot_n, slot_p)
        np.testing.assert_array_equal(strand_n, strand_p)

    def test_sparse_query_reference_keyed_rule(self):
        """fwd-then-revcomp probe rule (canonical_keys=False): native vs
        numpy engines must agree on every (tf, slot, strand)."""
        import random
        from aindex_tpu.core import codec
        from aindex_tpu.core.reads import ReadsStore
        from aindex_tpu.index.sparse23 import Sparse23Index
        rng = random.Random(12)
        reads = ["".join(rng.choice("ACGT") for _ in range(70))
                 for _ in range(25)]
        store = ReadsStore.from_sequences(reads)
        index = Sparse23Index.build_from_blob(store.blob)
        index.canonical_keys = False  # exercise the two-key probe path
        q = [r[s:s + 23] for r in reads for s in (0, 17, 40)]
        q += [codec.revcomp(q[1]), "G" * 23, "ACGTN" + "A" * 18]
        raw = "".join(q).encode("ascii")
        tf_n, slot_n, strand_n = index._query_host_ascii(raw, len(q))
        codes, valid = codec.encode_kmers(q, 23)
        tf_p, slot_p, strand_p = index._resolve_host(codes, valid)
        np.testing.assert_array_equal(tf_n, tf_p)
        np.testing.assert_array_equal(slot_n, slot_p)
        np.testing.assert_array_equal(strand_n, strand_p)


class TestGzipInputs:
    """Transparent gzip decompression for every input reader (the
    reference needs a manual destructive `gzip -d` pass)."""

    def test_compute_reads_gz_matches_plain(self, tmp_path):
        import gzip
        import shutil
        r1, r2 = f"{DATA}/test_R1.fastq", f"{DATA}/test_R2.fastq"
        g1, g2 = str(tmp_path / "r1.fq.gz"), str(tmp_path / "r2.fq.gz")
        for src, dst in ((r1, g1), (r2, g2)):
            with open(src, "rb") as fi, gzip.open(dst, "wb") as fo:
                shutil.copyfileobj(fi, fo)
        plain = io_fastq.compute_reads(r1, r2, "fastq", str(tmp_path / "p"))
        gz = io_fastq.compute_reads(g1, g2, "fastq", str(tmp_path / "g"))
        assert plain["n_reads"] == gz["n_reads"]
        assert open(plain["reads"], "rb").read() == \
            open(gz["reads"], "rb").read()
        assert open(plain["ridx"]).read() == open(gz["ridx"]).read()

    def test_reads_multi_input_aliasing_output_raises(self, tmp_path):
        """read_type='reads' with multiple inputs streams lines while
        writing the output .reads file; an input list that includes the
        output must raise instead of corrupting it (ADVICE r4)."""
        a = tmp_path / "a.txt"
        a.write_text("ACGT\nTTTT\n")
        out_reads = tmp_path / "out.reads"
        out_reads.write_text("GGGG\n")
        with pytest.raises(ValueError, match="only input"):
            io_fastq.compute_reads([str(a), str(out_reads)], None, "reads",
                                   str(tmp_path / "out"), use_native=False)
        # the single-input in-place form must keep working
        res = io_fastq.compute_reads([str(out_reads)], None, "reads",
                                     str(tmp_path / "out"), use_native=False)
        assert res["n_reads"] == 1
        assert out_reads.read_text() == "GGGG\n"

    def test_sniff_and_read_gz_fasta(self, tmp_path):
        import gzip
        fa = f"{DATA}/test.fasta"
        gz = str(tmp_path / "t.fa.gz")
        with open(fa, "rb") as fi, gzip.open(gz, "wb") as fo:
            fo.write(fi.read())
        assert io_fastq.sniff_format(gz) == "fasta"
        assert io_fastq.read_sequences(gz) == io_fastq.read_sequences(fa)
        got = [bytes(a) for a in io_fastq.iter_sequence_bytes(gz)]
        want = [bytes(a) for a in io_fastq.iter_sequence_bytes(fa)]
        assert got == want


class TestNativeThreading:
    """Threaded native paths must be invariant in the worker count."""

    def test_spectrum_thread_invariance(self, monkeypatch):
        import numpy as np
        from aindex_tpu import native
        if not native.available():
            import pytest
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(5)
        chunk = np.frombuffer(b"ACGTN\n", np.uint8)[
            rng.integers(0, 6, size=1 << 19)]
        monkeypatch.setenv("AINDEX_TPU_NATIVE_THREADS", "1")
        k1, c1 = native.host_spectrum_ascii(chunk, 23)
        monkeypatch.setenv("AINDEX_TPU_NATIVE_THREADS", "3")
        k3, c3 = native.host_spectrum_ascii(chunk, 23)
        assert (k1 == k3).all() and (c1 == c3).all()

    def test_query_thread_invariance(self, monkeypatch):
        import numpy as np
        from aindex_tpu import native
        from aindex_tpu.core.reads import ReadsStore
        from aindex_tpu.index.sparse23 import Sparse23Index
        if not native.available():
            import pytest
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(6)
        bases = np.frombuffer(b"ACGT", np.uint8)
        reads = [bytes(bases[rng.integers(0, 4, size=80)]).decode()
                 for _ in range(200)]
        idx = Sparse23Index.build_from_blob(
            ReadsStore.from_sequences(reads).blob)
        qs = ([r[i:i + 23] for r in reads for i in (0, 30)] * 200)[:1 << 17]
        raw = "".join(qs).encode()
        monkeypatch.setenv("AINDEX_TPU_NATIVE_THREADS", "1")
        a = tuple(np.asarray(x).copy()
                  for x in idx._query_host_ascii(raw, len(qs)))
        monkeypatch.setenv("AINDEX_TPU_NATIVE_THREADS", "3")
        b = idx._query_host_ascii(raw, len(qs))
        for x, y in zip(a, b):
            assert (x == np.asarray(y)).all()

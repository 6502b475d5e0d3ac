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

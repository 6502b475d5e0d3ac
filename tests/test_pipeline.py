"""Pipeline subsystem tests: streaming chunker parity, artifact-gated
resume, and progress reporting (SURVEY.md §5 auxiliary subsystems)."""

import logging
import os

import numpy as np
import pytest

from aindex_tpu.core.reads import ReadsStore, blob_chunks, stream_blob_chunks
from aindex_tpu.pipeline.build import BuildConfig, build_all
from aindex_tpu.pipeline.progress import Progress


@pytest.fixture(scope="module")
def reads(random_reads):
    return [r for r in random_reads if "~" not in r]


@pytest.fixture(scope="module")
def fasta(reads, tmp_path_factory):
    p = tmp_path_factory.mktemp("pipe") / "in.fa"
    p.write_text("".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)))
    return str(p)


class TestStreamChunks:
    @pytest.mark.parametrize("chunk", [64, 257, 4096])
    def test_matches_blob_chunks(self, reads, chunk):
        blob = ReadsStore.from_sequences(reads).blob
        pieces = (np.frombuffer((r + "\n").encode(), dtype=np.uint8)
                  for r in reads)
        got = list(stream_blob_chunks(pieces, 13, chunk))
        want = list(blob_chunks(blob, 13, chunk))
        assert len(got) == len(want)
        for (gp, go), (wp, wo) in zip(got, want):
            assert go == wo
            assert (gp == wp).all()

    def test_huge_single_piece_matches_blob_chunks(self):
        """One piece much larger than the chunk (whole-chromosome case,
        exercised through the O(N) cursor buffer) plus small followers."""
        rng = np.random.default_rng(55)
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        big = np.concatenate([bases[rng.integers(0, 4, size=50000)],
                              np.array([10], np.uint8)])
        smalls = [np.concatenate([bases[rng.integers(0, 4, size=40)],
                                  np.array([10], np.uint8)])
                  for _ in range(5)]
        blob = np.concatenate([big] + smalls)
        got = list(stream_blob_chunks(iter([big] + smalls), 23, 4096))
        want = list(blob_chunks(blob, 23, 4096))
        assert len(got) == len(want)
        for (gp, go), (wp, wo) in zip(got, want):
            assert go == wo and (gp == wp).all()

    def test_streaming_count_parity(self, reads):
        from aindex_tpu.index.dense13 import Dense13Index
        from aindex_tpu.index.sparse23 import (count_canonical_kmers,
                                               count_canonical_kmers_stream)
        blob = ReadsStore.from_sequences(reads).blob

        def pieces():
            return (np.frombuffer((r + "\n").encode(), dtype=np.uint8)
                    for r in reads)

        d_blob = Dense13Index.build_from_blob(blob)
        d_stream = Dense13Index.build_from_stream(pieces(), chunk=512)
        assert (d_blob.tf_host == d_stream.tf_host).all()

        k1, c1 = count_canonical_kmers(blob, 23)
        k2, c2 = count_canonical_kmers_stream(pieces(), 23, chunk=512)
        assert (k1 == k2).all() and (c1 == c2).all()


class TestMultiFileInputs:
    def test_build_all_concatenates_file_list(self, reads, tmp_path):
        """N>2 input files stream-concatenate into one reads set (the
        reference pipeline's comma-separated list handling,
        /root/reference/scripts/compute_aindex.py:125-131), and the
        resulting index equals the single-file build's."""
        import json
        thirds = [reads[:10], reads[10:20], reads[20:]]
        paths = []
        for i, part in enumerate(thirds):
            p = tmp_path / f"part{i}.fa"
            p.write_text("".join(f">r{j}\n{r}\n" for j, r in enumerate(part)))
            paths.append(str(p))
        whole = tmp_path / "whole.fa"
        whole.write_text("".join(f">r{j}\n{r}\n"
                                 for j, r in enumerate(reads)))
        cfg_m = BuildConfig(prefix=str(tmp_path / "multi"), k=23)
        build_all(paths, cfg_m)
        cfg_1 = BuildConfig(prefix=str(tmp_path / "single"), k=23)
        build_all([str(whole)], cfg_1)
        for suffix in (".reads", ".tf.bin", ".kmers.bin", ".index.bin",
                       ".indices.bin"):
            assert (tmp_path / ("multi" + suffix)).read_bytes() == \
                (tmp_path / ("single" + suffix)).read_bytes(), suffix

    def test_paired_fastq_still_requires_two(self, tmp_path):
        fq = tmp_path / "a.fq"
        fq.write_text("@r\nACGT\n+\nIIII\n")
        with pytest.raises(ValueError, match="exactly two"):
            build_all([str(fq)] * 3, BuildConfig(prefix=str(tmp_path / "x")),
                      read_type="fastq")


class TestExternalCounter:
    def test_dat_seeded_build_matches_counted_build(self, reads, tmp_path):
        """--dat seeds the sparse build from ANY external counter's text
        spectrum (the reference's jellyfish option,
        /root/reference/scripts/compute_aindex.py:109-187) — artifacts
        must equal the internally-counted build's."""
        fa = tmp_path / "in.fa"
        fa.write_text("".join(f">r{i}\n{r}\n" for i, r in enumerate(reads)))
        counted = BuildConfig(prefix=str(tmp_path / "c.23"), k=23,
                              keep_dat=True)
        build_all([str(fa)], counted)
        seeded = BuildConfig(prefix=str(tmp_path / "d.23"), k=23,
                             dat_path=str(tmp_path / "c.23.dat"))
        build_all([str(fa)], seeded)
        for sfx in (".pf", ".tf.bin", ".kmers.bin", ".index.bin",
                    ".indices.bin"):
            assert (tmp_path / ("d.23" + sfx)).read_bytes() == \
                (tmp_path / ("c.23" + sfx)).read_bytes(), sfx

    def test_load_dat_merges_and_validates(self, tmp_path):
        from aindex_tpu.pipeline.build import load_dat
        from aindex_tpu.core import codec
        km = "ACGTACGTACGTACGTACGTACG"
        rc = codec.revcomp(km)
        p = tmp_path / "x.dat"
        p.write_text(f"{km}\t3\n{rc}\t4\n\n")
        keys, counts = load_dat(str(p), 23)
        assert keys.size == 1 and counts[0] == 7  # canonical merge
        p.write_text("ACGTNCGTACGTACGTACGTACG\t1\n")
        with pytest.raises(ValueError, match="non-ACGT"):
            load_dat(str(p), 23)

    def test_load_dat_rejects_missing_count_column(self, tmp_path):
        """A row without a count is a malformed spectrum — it must raise,
        not admit a zero-tf key (ADVICE r4)."""
        from aindex_tpu.pipeline.build import load_dat
        p = tmp_path / "bad.dat"
        p.write_text("ACGTACGTACGTACGTACGTACG\n")
        with pytest.raises(ValueError, match="count column"):
            load_dat(str(p), 23)


class TestResume:
    def test_skip_existing_is_noop(self, fasta, tmp_path, caplog):
        prefix = str(tmp_path / "r.23")
        cfg = BuildConfig(prefix=prefix, k=23, chunk=2048, skip_existing=True)
        build_all([fasta], cfg)
        mtimes = {p: os.path.getmtime(prefix + p)
                  for p in (".reads", ".tf.bin", ".pf", ".index.bin")}
        with caplog.at_level(logging.INFO, logger="aindex_tpu.pipeline"):
            build_all([fasta], cfg)
        assert sum("resumed" in r.message for r in caplog.records) >= 3
        for p, t in mtimes.items():
            assert os.path.getmtime(prefix + p) == t, f"{p} was rewritten"

    def test_stale_positional_rebuilt(self, fasta, tmp_path):
        prefix = str(tmp_path / "s.13")
        cfg = BuildConfig(prefix=prefix, k=13, chunk=2048, skip_existing=True)
        build_all([fasta], cfg)
        good = np.fromfile(prefix + ".index.bin", dtype=np.uint64)
        # truncate the positions artifact: gate must detect and rebuild
        good[:10].tofile(prefix + ".index.bin")
        build_all([fasta], cfg)
        again = np.fromfile(prefix + ".index.bin", dtype=np.uint64)
        assert (again == good).all()


class TestProgress:
    def test_renders_and_completes(self, capsys):
        import io
        buf = io.StringIO()
        with Progress(1000, "phase", interval=0.0, stream=buf) as p:
            p.step(250)
            p.step(1000)
        # non-tty stream -> log lines; force-check via a tty-like stream
        class Tty(io.StringIO):
            def isatty(self):
                return True
        t = Tty()
        with Progress(1000, "phase", interval=0.0, stream=t) as p:
            p.step(500)
        out = t.getvalue()
        assert "50.0%" in out and "100.0%" in out

    def test_build_with_progress_flag(self, fasta, tmp_path):
        prefix = str(tmp_path / "p.13")
        cfg = BuildConfig(prefix=prefix, k=13, chunk=1024, progress=True)
        build_all([fasta], cfg)  # must not raise
        assert os.path.exists(prefix + ".tf.bin")

"""CLI integration tests: every subcommand end-to-end in a temp sandbox
(the strategy of the reference's test_cli.py, SURVEY.md §4 level 2).

Subcommands run in-process via cli.main() — same code path as
``python -m aindex_tpu.cli`` without per-test interpreter startup.
"""

import os

import numpy as np
import pytest

from aindex_tpu.cli import main

DATA = os.path.join(os.path.dirname(__file__), "data")


def run(*argv) -> int:
    return main(list(argv))


@pytest.fixture()
def sandbox(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


class TestComputeReads:
    def test_paired_fastq(self, sandbox, capsys):
        assert run("compute-reads", "-i",
                   f"{DATA}/test_R1.fastq,{DATA}/test_R2.fastq",
                   "-t", "fastq", "-o", "pe") == 0
        lines = open("pe.reads").read().splitlines()
        assert len(lines) == 5
        assert all("~" in ln for ln in lines)

    def test_se_sniffed(self, sandbox):
        assert run("compute-reads", "-i", f"{DATA}/test_se.fastq", "-o", "se") == 0
        assert len(open("se.reads").read().splitlines()) == 4

    def test_fasta(self, sandbox):
        assert run("compute-reads", "-i", f"{DATA}/test.fasta", "-o", "fa") == 0
        lines = open("fa.reads").read().splitlines()
        assert len(lines) == 3
        assert len(lines[1]) == 120  # multi-line record concatenated
        assert os.path.exists("fa.header")

    def test_refuses_overwriting_input(self, sandbox):
        open("x.reads", "w").write("ACGT\n")
        with pytest.raises(SystemExit):
            run("compute-reads", "-i", "x.reads", "-t", "reads", "-o", "x")


class TestCountAndIndex:
    def test_count_13(self, sandbox):
        assert run("count", "-i", f"{DATA}/test.fasta", "-k", "13",
                   "-o", "c13") == 0
        assert os.path.getsize("c13.tf.bin") == 4**13 * 8

    def test_count_23_dat(self, sandbox):
        assert run("count", "-i", f"{DATA}/test.fasta", "-k", "23",
                   "-o", "c23") == 0
        rows = [ln.split("\t") for ln in open("c23.dat").read().splitlines()]
        assert all(len(r[0]) == 23 for r in rows)
        tfs = [int(r[1]) for r in rows]
        assert tfs == sorted(tfs, reverse=True)

    def test_build_hash_skips_13(self, sandbox, capsys):
        open("kmers.txt", "w").write("ACGTACGTACGTA\n")
        assert run("build-hash", "-i", "kmers.txt", "-k", "13", "-o", "h") == 0
        assert not os.path.exists("h.pf")

    def test_build_hash_23(self, sandbox):
        run("count", "-i", f"{DATA}/test.fasta", "-k", "23", "-o", "c23")
        assert run("build-hash", "-i", "c23.dat", "-k", "23", "-o", "h") == 0
        assert os.path.exists("h.pf")

    def test_compute_index_from_dat(self, sandbox):
        run("count", "-i", f"{DATA}/test.fasta", "-k", "23", "-o", "c23")
        assert run("compute-index", "-d", "c23.dat", "-o", "idx") == 0
        for suffix in (".pf", ".tf.bin", ".kmers.bin"):
            assert os.path.exists("idx" + suffix)
        # loadable + queries match the .dat
        from aindex_tpu.index.sparse23 import Sparse23Index
        index = Sparse23Index.load("idx")
        rows = [ln.split("\t") for ln in open("c23.dat").read().splitlines()]
        got = index.get_tf_values([r[0] for r in rows[:50]])
        assert [int(v) for v in got] == [int(r[1]) for r in rows[:50]]


class TestGenerate:
    def test_generate_binary(self, sandbox):
        assert run("generate", "-o", "all13.bin", "--binary") == 0
        with open("all13.bin", "rb") as f:
            assert f.read(4) == b"KMR3"
        assert os.path.getsize("all13.bin") == 4 + 4**13 * 4


class TestFullPipeline:
    def test_compute_aindex_13(self, sandbox):
        assert run("compute-aindex", "-i", f"{DATA}/test.fasta",
                   "-o", "p13", "-k", "13") == 0
        from aindex_tpu.api import AIndex
        index = AIndex.load_from_prefix("p13", load_reads=True)
        seq = index.get_read_by_rid(0)
        km = seq[:13]
        assert index[km] >= 1
        poses = index.get_rid2poses(km)
        assert 0 in poses
        assert all(seq[off:off + 13] == km for off in poses[0])

    def test_compute_aindex_23(self, sandbox):
        assert run("compute-aindex", "-i", f"{DATA}/test.fasta",
                   "-o", "p23", "-k", "23", "--keep-dat") == 0
        from aindex_tpu.api import AIndex
        index = AIndex.load_from_prefix("p23", load_reads=True)
        rows = [ln.split("\t") for ln in open("p23.dat").read().splitlines()]
        km, tf = rows[0][0], int(rows[0][1])
        assert index[km] == tf
        assert len(index.get_positions(km)) == tf

    def test_pipeline_paired(self, sandbox):
        assert run("compute-aindex", "-i",
                   f"{DATA}/test_R1.fastq,{DATA}/test_R2.fastq",
                   "-t", "fastq", "-o", "pe23") == 0
        assert os.path.exists("pe23.index.bin")


class TestMisc:
    def test_reads_to_fasta(self, sandbox):
        run("compute-reads", "-i", f"{DATA}/test_se.fastq", "-o", "se")
        assert run("reads-to-fasta", "-i", "se.reads", "-o", "se.fasta") == 0
        lines = open("se.fasta").read().splitlines()
        assert lines[0] == ">0"

    def test_info(self, sandbox, capsys):
        run("compute-aindex", "-i", f"{DATA}/test.fasta", "-o", "q13", "-k", "13")
        capsys.readouterr()
        assert run("info", "-p", "q13", "--stats") == 0
        out = capsys.readouterr().out
        assert "13-mer dense index" in out

    def test_version(self, capsys):
        assert run("version") == 0
        assert capsys.readouterr().out.strip()

    def test_platform(self, capsys):
        assert run("platform") == 0
        assert "backend" in capsys.readouterr().out

    def test_api_docs(self, capsys):
        assert run("api-docs") == 0
        assert "get_tf_value" in capsys.readouterr().out

    def test_no_command_prints_help(self, capsys):
        assert main([]) == 1

    def test_count_direct_alias(self, sandbox):
        assert run("count-direct", "-i", f"{DATA}/test_reads.txt",
                   "-k", "13", "-o", "d13") == 0
        assert os.path.exists("d13.tf.bin")

    def test_compute_aindex_direct(self, sandbox):
        assert run("compute-aindex-direct", "-i", f"{DATA}/test.fasta",
                   "-o", "dir13") == 0
        assert os.path.exists("dir13.index.bin")


class TestAnalyze:
    def test_analyze_matches_bruteforce(self, sandbox, capsys):
        """`analyze` reproduces the reference analyze_kmers.py report
        semantics (/root/reference/analyze_kmers.py:62-146): canonical
        counts, per-occurrence (rid, in-read pos, direction), sort by
        count desc then k-mer, plus the .summary block."""
        from aindex_tpu.core.codec import revcomp
        from aindex_tpu.io.fastq import read_sequences
        assert run("analyze", "-i", f"{DATA}/test.fasta", "-k", "13",
                   "-o", "an.txt") == 0
        seqs = read_sequences(f"{DATA}/test.fasta")
        want = {}
        for rid, s in enumerate(seqs):
            for i in range(len(s) - 12):
                km = s[i:i + 13]
                if set(km) <= set("ACGT"):
                    canon = min(km, revcomp(km))
                    want.setdefault(canon, []).append(
                        (rid, i, 0 if km == canon else 1))
        lines = [l.rstrip("\n").split("\t")
                 for l in open("an.txt") if l.strip()]
        assert len(lines) == len(want)
        prev = None
        for parts in lines:
            km, cnt, occ = parts[0], int(parts[1]), parts[2:]
            assert cnt == len(want[km])
            got = [tuple(map(int, o.split(","))) for o in occ]
            assert sorted(got) == sorted(want[km]), km
            key = (-cnt, km)
            assert prev is None or prev <= key  # count desc, kmer asc
            prev = key
        summary = open("an.txt.summary").read()
        assert f"Unique k-mers: {len(want)}" in summary
        assert f"Total k-mers: {sum(len(v) for v in want.values())}" in summary

    def test_analyze_min_count(self, sandbox):
        assert run("analyze", "-i", f"{DATA}/test.fasta", "-k", "13",
                   "-o", "an2.txt", "--min-count", "2") == 0
        for line in open("an2.txt"):
            if line.strip():
                assert int(line.split("\t")[1]) >= 2

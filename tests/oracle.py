"""Independent pure-Python oracle for k-mer counts, coverage and positions.

The golden-value strategy of the reference test suite (SURVEY.md §4: an
independent recomputation the built index is compared against, in the spirit
of the reference's tests/analyze_kmers.py — written from scratch here).
Deliberately naive: string slicing and dict counting, no shared code with the
engine under test.
"""

from __future__ import annotations

import collections

_COMP = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}


def rc(seq: str) -> str:
    return "".join(_COMP.get(c, c) for c in reversed(seq))


def valid(kmer: str) -> bool:
    return all(c in "ACGT" for c in kmer)


def count_forward(reads: list[str], k: int) -> dict[str, int]:
    """Forward-strand counts over every read (13-mer mode semantics)."""
    counts: dict[str, int] = collections.Counter()
    for read in reads:
        for i in range(len(read) - k + 1):
            km = read[i:i + k]
            if valid(km):
                counts[km] += 1
    return dict(counts)


def count_canonical(reads: list[str], k: int) -> dict[str, int]:
    """Canonical (min of fwd/rc) counts (23-mer mode semantics)."""
    counts: dict[str, int] = collections.Counter()
    for read in reads:
        for i in range(len(read) - k + 1):
            km = read[i:i + k]
            if valid(km):
                counts[min(km, rc(km))] += 1
    return dict(counts)


def blob_of(reads: list[str]) -> str:
    return "".join(r + "\n" for r in reads)


def positions_forward(reads: list[str], k: int) -> dict[str, list[int]]:
    """kmer -> sorted 0-based blob offsets of forward occurrences."""
    blob = blob_of(reads)
    pos: dict[str, list[int]] = collections.defaultdict(list)
    for i in range(len(blob) - k + 1):
        km = blob[i:i + k]
        if valid(km):
            pos[km].append(i)
    return dict(pos)


def positions_canonical(reads: list[str], k: int) -> dict[str, list[int]]:
    """canonical kmer -> sorted 0-based blob offsets of either-strand
    occurrences."""
    blob = blob_of(reads)
    pos: dict[str, list[int]] = collections.defaultdict(list)
    for i in range(len(blob) - k + 1):
        km = blob[i:i + k]
        if valid(km):
            pos[min(km, rc(km))].append(i)
    return dict(pos)


def coverage_forward(counts: dict[str, int], seq: str, k: int) -> list[int]:
    return [counts.get(seq[i:i + k], 0) if valid(seq[i:i + k]) else 0
            for i in range(len(seq) - k + 1)]


def coverage_canonical(counts: dict[str, int], seq: str, k: int) -> list[int]:
    out = []
    for i in range(len(seq) - k + 1):
        km = seq[i:i + k]
        out.append(counts.get(min(km, rc(km)), 0) if valid(km) else 0)
    return out

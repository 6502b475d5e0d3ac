"""ctypes bridge to the native host runtime (native/libaindex_host.so).

The native library owns the serial/file-I/O phases (reads preparation, MPHF
peeling, newline scans) — the role C++ plays below the Python line in the
reference (SURVEY.md §2). Every entry point has a pure-Python fallback, so
the package works without the library; ``ensure_built()`` compiles it on
demand with g++.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libaindex_host.so")

_lib: ctypes.CDLL | None = None
_load_failed = False


def _configure(lib: ctypes.CDLL) -> None:
    lib.mphf_try_build.restype = ctypes.c_int32
    lib.mphf_try_build.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, ctypes.c_uint64,
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64)]
    lib.jenkins_triple_codes.restype = None
    lib.jenkins_triple_codes.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint64)]
    lib.emphf_peel_assign.restype = ctypes.c_int32
    lib.emphf_peel_assign.argtypes = [
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int64, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint8)]
    lib.compute_reads_fastq.restype = ctypes.c_int64
    lib.compute_reads_fastq.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                        ctypes.c_char_p]
    lib.compute_reads_fasta.restype = ctypes.c_int64
    lib.compute_reads_fasta.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.compute_reads_plain.restype = ctypes.c_int64
    lib.compute_reads_plain.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                        ctypes.c_int32]
    lib.scan_newlines.restype = ctypes.c_int64
    lib.scan_newlines.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64]
    lib.cuckoo_build.restype = ctypes.c_int32
    lib.cuckoo_build.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_uint64,
        ctypes.c_uint64, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32)]
    lib.quot_build.restype = ctypes.c_int32
    lib.quot_build.argtypes = [
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_uint64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_uint64, ctypes.c_uint64, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32)]
    lib.sparse_query_ascii_quot.restype = ctypes.c_int64
    lib.sparse_query_ascii_quot.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_uint64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_uint64, ctypes.c_uint64, ctypes.c_uint64,
        ctypes.c_uint64, ctypes.c_int32, ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    lib.encode_kmers_2bit.restype = ctypes.c_int64
    lib.encode_kmers_2bit.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint64), ctypes.POINTER(ctypes.c_uint8)]
    lib.host_spectrum_ascii.restype = ctypes.c_int64
    lib.host_spectrum_ascii.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64)]
    lib.dense_query_ascii.restype = ctypes.c_int64
    lib.dense_query_ascii.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint32)]
    lib.sparse_query_ascii.restype = ctypes.c_int64
    lib.sparse_query_ascii.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64,
        ctypes.c_uint64, ctypes.c_uint64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]


def ensure_built(force: bool = False) -> bool:
    """Compile the native library if missing or stale. Returns True when
    usable. Staleness is decided by mtime (source newer than .so) — it must
    be rebuilt BEFORE the first dlopen, since dlopen caches by path and a
    rebuild after loading would not be picked up in this process."""
    global _load_failed
    src = os.path.join(_NATIVE_DIR, "aindex_host.cpp")
    if os.path.exists(_SO_PATH) and not force:
        try:
            if os.path.getmtime(_SO_PATH) >= os.path.getmtime(src):
                return True
        except OSError:
            return True
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-fPIC", "-Wall",
             "-pthread", "-shared", "-o", _SO_PATH, src],
            check=True, capture_output=True, timeout=300)
        _load_failed = False
        return True
    except (subprocess.CalledProcessError, OSError, subprocess.TimeoutExpired) as e:
        logger.warning("native build failed: %s", e)
        return False


def get_lib() -> ctypes.CDLL | None:
    """The loaded native library, building it on first use; None on failure."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    if not ensure_built():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        _configure(lib)  # AttributeError = stale .so that mtime missed;
        # no in-process retry is possible (dlopen caches by path), so fail
        # to the pure-Python fallbacks and let the next process rebuild
        _lib = lib
        return lib
    except (OSError, AttributeError) as e:
        logger.warning("native load failed: %s", e)
        _load_failed = True
        return None


def available() -> bool:
    return get_lib() is not None


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

def mphf_try_build(keys: np.ndarray, seed: int, domain: int
                   ) -> tuple[np.ndarray, np.ndarray] | None:
    """One seed trial of hypergraph peeling. Returns (g, owner) — g
    uint8[3*domain] with 3 = unassigned, owner int64[n] = the node owning
    each key (rank(owner) is the key's slot) — or None if the trial failed
    to peel."""
    lib = get_lib()
    assert lib is not None
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    g = np.empty(3 * domain, dtype=np.uint8)
    owner = np.empty(len(keys), dtype=np.int64)
    ok = lib.mphf_try_build(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        ctypes.c_int64(len(keys)), ctypes.c_uint64(seed),
        ctypes.c_uint64(domain),
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        owner.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
    return (g, owner) if ok else None


def jenkins_triple_codes(codes: np.ndarray, k: int, seed: int
                         ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Jenkins lookup8 triple per 2-bit code — bit-identical to the numpy
    twin in index/emphf.py, ~10x faster on large batches."""
    lib = get_lib()
    assert lib is not None
    codes = np.ascontiguousarray(codes, dtype=np.uint64)
    n = len(codes)
    h0 = np.empty(n, np.uint64)
    h1 = np.empty(n, np.uint64)
    h2 = np.empty(n, np.uint64)
    p64 = ctypes.POINTER(ctypes.c_uint64)
    lib.jenkins_triple_codes(
        codes.ctypes.data_as(p64), ctypes.c_int64(n), ctypes.c_int32(k),
        ctypes.c_uint64(seed), h0.ctypes.data_as(p64),
        h1.ctypes.data_as(p64), h2.ctypes.data_as(p64))
    return h0, h1, h2


def emphf_peel_assign(nodes0: np.ndarray, nodes1: np.ndarray,
                      nodes2: np.ndarray, domain: int) -> np.ndarray | None:
    """Bit-exact emphf peel + assignment for one seed trial: returns the
    g vector (uint8[3*domain], 0 = unassigned) in the reference builder's
    exact sequential order, or None when the hypergraph is not peelable.
    Caller provides partition-offset uint32 node ids per edge."""
    lib = get_lib()
    assert lib is not None
    n = len(nodes0)
    g = np.zeros(3 * domain, dtype=np.uint8)
    p32 = ctypes.POINTER(ctypes.c_uint32)
    ok = lib.emphf_peel_assign(
        np.ascontiguousarray(nodes0, np.uint32).ctypes.data_as(p32),
        np.ascontiguousarray(nodes1, np.uint32).ctypes.data_as(p32),
        np.ascontiguousarray(nodes2, np.uint32).ctypes.data_as(p32),
        ctypes.c_int64(n), ctypes.c_uint64(domain),
        g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return g if ok else None


def compute_reads_native(input1: str, input2: str | None, read_type: str,
                         output_prefix: str) -> int | None:
    """Native reads preparation; returns n_reads or None when unsupported."""
    lib = get_lib()
    if lib is None:
        return None
    if read_type == "fastq":
        if not input2:
            return None
        n = lib.compute_reads_fastq(input1.encode(), input2.encode(),
                                    output_prefix.encode())
    elif read_type == "se":
        n = lib.compute_reads_fastq(input1.encode(), None,
                                    output_prefix.encode())
    elif read_type == "fasta":
        n = lib.compute_reads_fasta(input1.encode(), output_prefix.encode())
    elif read_type == "reads":
        copy = int(os.path.abspath(input1)
                   != os.path.abspath(output_prefix + ".reads"))
        n = lib.compute_reads_plain(input1.encode(), output_prefix.encode(),
                                    copy)
    else:
        return None
    return int(n) if n >= 0 else None


def cuckoo_build(keys: np.ndarray, tf: np.ndarray, slot: np.ndarray,
                 m: int, seed1: int, seed2: int) -> np.ndarray | None:
    """Native cuckoo insertion; returns uint32[2m, 4] table or None on
    eviction-cycle failure (caller reseeds/grows)."""
    lib = get_lib()
    assert lib is not None
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    tf = np.ascontiguousarray(tf, dtype=np.uint32)
    slot = np.ascontiguousarray(slot, dtype=np.int32)
    table = np.empty((2 * m, 4), dtype=np.uint32)
    ok = lib.cuckoo_build(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        tf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        slot.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(keys)), ctypes.c_uint64(m),
        ctypes.c_uint64(seed1), ctypes.c_uint64(seed2),
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)))
    return table if ok else None


def quot_build(keys: np.ndarray, tf: np.ndarray, slot: np.ndarray, m: int,
               lb: int, w: int, mults: tuple[int, int, int, int]
               ) -> tuple[np.ndarray, np.ndarray] | None:
    """Native quotiented-cuckoo insertion; returns (fp_tf uint32[2m, 2],
    slot int32[2m]) or None on eviction-cycle failure (caller re-derives
    multipliers / grows). See index/quotcuckoo.py for the layout."""
    lib = get_lib()
    assert lib is not None
    keys = np.ascontiguousarray(keys, dtype=np.uint64)
    tf = np.ascontiguousarray(tf, dtype=np.uint32)
    slot = np.ascontiguousarray(slot, dtype=np.int32)
    fp_tf = np.empty((2 * m, 2), dtype=np.uint32)
    slot_col = np.empty(2 * m, dtype=np.int32)
    ok = lib.quot_build(
        keys.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        tf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        slot.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(len(keys)), ctypes.c_uint64(m), ctypes.c_int32(lb),
        ctypes.c_int32(w), ctypes.c_uint64(mults[0]),
        ctypes.c_uint64(mults[1]), ctypes.c_uint64(mults[2]),
        ctypes.c_uint64(mults[3]),
        fp_tf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        slot_col.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return (fp_tf, slot_col) if ok else None


def sparse_query_ascii_quot(raw: np.ndarray | bytes, n: int, k: int,
                            canonical_keys: bool, fp_tf: np.ndarray,
                            slot_col: np.ndarray, m: int, lb: int, w: int,
                            mults
                            ) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Fused host engine over the quotiented table: ASCII k-mer batch ->
    (tf, slot, strand) in one C pass. None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, bytes) \
        else np.ascontiguousarray(raw, dtype=np.uint8)
    fp_tf = np.ascontiguousarray(fp_tf, dtype=np.uint32)
    slot_col = np.ascontiguousarray(slot_col, dtype=np.int32)
    tf = np.empty(n, dtype=np.uint32)
    slot = np.empty(n, dtype=np.int32)
    strand = np.empty(n, dtype=np.int32)
    lib.sparse_query_ascii_quot(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int32(k),
        ctypes.c_int32(1 if canonical_keys else 0),
        fp_tf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        slot_col.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_uint64(m), ctypes.c_int32(lb), ctypes.c_int32(w),
        ctypes.c_uint64(int(mults[0])), ctypes.c_uint64(int(mults[1])),
        ctypes.c_uint64(int(mults[2])), ctypes.c_uint64(int(mults[3])),
        ctypes.c_int32(native_threads()),
        tf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        slot.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        strand.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return tf, slot, strand


def scan_newlines_native(blob: np.ndarray) -> tuple[np.ndarray, np.ndarray] | None:
    lib = get_lib()
    if lib is None:
        return None
    blob = np.ascontiguousarray(blob, dtype=np.uint8)
    cap = int(np.count_nonzero(blob == ord("\n"))) + 1
    starts = np.empty(cap, dtype=np.int64)
    ends = np.empty(cap, dtype=np.int64)
    n = lib.scan_newlines(
        blob.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(blob.size),
        starts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ends.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(cap))
    if n < 0:
        return None
    return starts[:n], ends[:n]


def encode_kmers_2bit(raw: np.ndarray | bytes, n: int, k: int
                      ) -> tuple[np.ndarray, np.ndarray] | None:
    """Flat ASCII run of n k-mers -> (codes uint64[n], valid bool[n]);
    None when the library is unavailable. Same encode that
    sparse_query_ascii fuses with its probes, exported standalone so the
    parity tests can pin it against codec.encode_kmers. (codec itself keeps
    its vectorised numpy pipeline, which beats this scalar loop at large
    batches.)"""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, bytes) \
        else np.ascontiguousarray(raw, dtype=np.uint8)
    codes = np.empty(n, dtype=np.uint64)
    valid = np.empty(n, dtype=np.uint8)
    lib.encode_kmers_2bit(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int32(k),
        codes.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        valid.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return codes, valid.astype(bool)


def sparse_query_ascii(raw: np.ndarray | bytes, n: int, k: int,
                       canonical_keys: bool, table: np.ndarray, m: int,
                       seed1, seed2
                       ) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Fused host engine for the sparse index: ASCII k-mer batch ->
    (tf uint32[n], slot int32[n], strand int32[n]) in one C pass (encode +
    canonical + verified cuckoo probes). None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, bytes) \
        else np.ascontiguousarray(raw, dtype=np.uint8)
    table = np.ascontiguousarray(table, dtype=np.uint32)
    tf = np.empty(n, dtype=np.uint32)
    slot = np.empty(n, dtype=np.int32)
    strand = np.empty(n, dtype=np.int32)
    lib.sparse_query_ascii(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int32(k),
        ctypes.c_int32(1 if canonical_keys else 0),
        table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_uint64(m), ctypes.c_uint64(int(seed1)),
        ctypes.c_uint64(int(seed2)), ctypes.c_int32(native_threads()),
        tf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        slot.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        strand.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return tf, slot, strand


def native_threads() -> int:
    """Worker count for threaded native paths: AINDEX_TPU_NATIVE_THREADS,
    else every core (the reference counters also default to
    hardware_concurrency)."""
    env = os.environ.get("AINDEX_TPU_NATIVE_THREADS")
    if env:
        try:
            return max(1, int(env))
        except ValueError:
            pass
    return os.cpu_count() or 1


def host_spectrum_ascii(chunk: np.ndarray, k: int
                        ) -> tuple[np.ndarray, np.ndarray] | None:
    """(sorted unique canonical codes, counts) of an ASCII chunk in one C
    pass chain (rolling encode + radix sort + run-length; threaded over
    byte ranges like the reference counters); None when the native
    library is unavailable or k unsupported."""
    lib = get_lib()
    if lib is None or not (1 <= k <= 31):
        return None
    chunk = np.ascontiguousarray(chunk, dtype=np.uint8)
    cap = max(chunk.size - k + 1, 1)
    keys = np.empty(cap, np.uint64)
    counts = np.empty(cap, np.uint64)
    p64 = ctypes.POINTER(ctypes.c_uint64)
    n_u = lib.host_spectrum_ascii(
        chunk.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(chunk.size), ctypes.c_int32(k),
        ctypes.c_int32(native_threads()),
        keys.ctypes.data_as(p64), counts.ctypes.data_as(p64))
    if n_u < 0:
        return None
    return keys[:n_u].copy(), counts[:n_u].copy()


def dense_query_ascii(raw: np.ndarray | bytes, n: int, k: int,
                      table: np.ndarray, both: bool = False
                      ) -> np.ndarray | tuple[np.ndarray, np.ndarray] | None:
    """Fused dense host engine: ASCII k-mer batch -> uint32 tf per key via
    one prefetched gather of the given host table (two for ``both``,
    returning (fwd, rc)); threaded. None when unavailable."""
    lib = get_lib()
    if lib is None or table.dtype != np.uint32:
        return None
    buf = np.frombuffer(raw, dtype=np.uint8) if isinstance(raw, bytes) \
        else np.ascontiguousarray(raw, dtype=np.uint8)
    table = np.ascontiguousarray(table)
    out1 = np.empty(n, np.uint32)
    out2 = np.empty(n, np.uint32) if both else out1
    p32 = ctypes.POINTER(ctypes.c_uint32)
    lib.dense_query_ascii(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_int64(n), ctypes.c_int32(k),
        table.ctypes.data_as(p32), ctypes.c_int32(2 if both else 0),
        ctypes.c_int32(native_threads()),
        out1.ctypes.data_as(p32), out2.ctypes.data_as(p32))
    return (out1, out2) if both else out1

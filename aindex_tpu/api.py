"""AIndex facade — the user-facing API, mirroring the reference surface.

Reference: aindex/core/aindex.py:48-794 (AIndex class over the pybind11
AindexWrapper). Here the engine is pure JAX + numpy; both index modes can be
loaded side by side, queries dispatch on k-mer length exactly like the
reference wrapper (/root/reference/src/python_wrapper.cpp:644-664,825-831).
"""

from __future__ import annotations

import logging
import os
from collections import defaultdict
from enum import IntEnum
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from aindex_tpu.constants import K13, K23, SPACE_13
from aindex_tpu.core import codec
from aindex_tpu.core.reads import ReadsStore
from aindex_tpu.index.dense13 import Dense13Index
from aindex_tpu.index.positional import PositionalIndex
from aindex_tpu.index.sparse23 import Sparse23Index

logger = logging.getLogger(__name__)


class Strand(IntEnum):
    NOT_FOUND = 0
    FORWARD = 1
    REVERSE = 2


class AIndex:
    """K-mer index facade. Use the ``load_from_prefix`` / ``build_*``
    constructors; query via the dict protocol or the batched methods."""

    def __init__(self):
        self.dense13: Dense13Index | None = None
        self.sparse23: Sparse23Index | None = None
        self.pos13: PositionalIndex | None = None
        self.pos23: PositionalIndex | None = None
        self.reads: ReadsStore | None = None
        self.max_tf = 0
        self._loaded = False
        self._sharded23 = None  # mesh-resident engine after shard_to()

    # ------------------------------------------------------------------
    # multi-device placement
    # ------------------------------------------------------------------

    def shard_to(self, mesh) -> "AIndex":
        """Place the loaded indexes on a device mesh (SURVEY.md §2.7,
        BASELINE.md north star): the sparse table's per-slot arrays shard
        by slot range over the ``index`` axis and tf queries merge with one
        psum; the dense 13-mer table replicates (it is the cheaper layout —
        4^13 entries fit every chip's HBM and replication makes queries
        collective-free). Returns self; subsequent sparse tf queries are
        served by the sharded engine."""
        if self.sparse23 is not None:
            # hasattr on the mphf, not the g_packed property — the property
            # would lazily H2D the walk tables just to answer the check
            if not hasattr(self.sparse23.mphf, "g_packed") \
                    or not self.sparse23.canonical_keys:
                # reference-format (emphf) indexes have no device MPHF walk
                # and need the fwd-else-revcomp probe rule — the slot-sharded
                # engine supports neither; keep the single-device engine
                logger.warning(
                    "shard_to: sparse index is reference-keyed (emphf) — "
                    "slot-sharded queries unavailable, keeping the "
                    "single-device query engine")
            else:
                from aindex_tpu.parallel.query23 import ShardedSparse23
                self._sharded23 = ShardedSparse23(self.sparse23, mesh)
                # free the unsharded device replicas: after this, per-device
                # HBM holds only this host's shard (+ the tiny replicated
                # g-values); host arrays stay for save/iteration/stats
                self.sparse23.release_device()
        if self.dense13 is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec
            self.dense13.tf = jax.device_put(
                self.dense13.tf, NamedSharding(mesh, PartitionSpec()))
        return self

    # ------------------------------------------------------------------
    # loading
    # ------------------------------------------------------------------

    @staticmethod
    def load_from_prefix(prefix: str, kmer_size: Optional[int] = None,
                         max_tf: int = 100000, load_aindex: bool = True,
                         load_reads: bool = False) -> "AIndex":
        """Auto-detecting loader (aindex/core/aindex.py:420-499).

        13-mer mode = <prefix>.tf.bin of exactly 4^13 uint64 entries;
        23-mer mode = <prefix>.pf + .tf.bin + .kmers.bin.
        """
        idx = AIndex()
        tf_file = f"{prefix}.tf.bin"
        pf_file = f"{prefix}.pf"
        kmers_bin = f"{prefix}.kmers.bin"
        if kmer_size is None:
            if os.path.exists(tf_file) and os.path.getsize(tf_file) == SPACE_13 * 8 \
                    and not os.path.exists(kmers_bin):
                # dense 13-mer (ours has no .pf; the reference's has an emphf
                # .pf but never a .kmers.bin — both land here)
                kmer_size = 13
            elif all(os.path.exists(p) for p in (pf_file, tf_file, kmers_bin)):
                kmer_size = 23
            elif os.path.exists(tf_file) and os.path.getsize(tf_file) == SPACE_13 * 8:
                kmer_size = 13
            else:
                raise FileNotFoundError(
                    f"Could not auto-detect k-mer size for prefix '{prefix}'. "
                    f"Expected {tf_file} (13-mer, 512MB dense) or "
                    f"{pf_file}+{tf_file}+{kmers_bin} (23-mer).")

        slot_perm = None  # reference 13-mer artifacts: MPHF slot per code
        if kmer_size == 13:
            # a reference-built dense table is in emphf-slot order and ships
            # with the 13-mer .pf; reorder it to code order on load
            pf_for_13 = None
            if os.path.exists(pf_file):
                from aindex_tpu.index.emphf import EmphfPF
                if EmphfPF.is_emphf_file(pf_file):
                    pf_for_13 = pf_file
            if pf_for_13 is not None:
                from aindex_tpu.index.emphf import (EmphfPF,
                                                    dense_slot_permutation)
                slot_perm = dense_slot_permutation(EmphfPF.load(pf_for_13), K13)
                raw = np.fromfile(tf_file, dtype=np.uint64, count=SPACE_13)
                # uint64-safe path: keeps the exact host table and warns
                # if any reference count saturates the uint32 device table
                idx.dense13 = Dense13Index._from_raw_u64(raw[slot_perm],
                                                         tf_file)
                idx._loaded = True
            else:
                idx.load_13mer_index(tf_file)
        elif kmer_size == 23:
            idx.load_23mer_index(prefix)
            idx.max_tf = max_tf
        else:
            raise ValueError(f"Unsupported kmer size: {kmer_size}")

        if load_aindex:
            index_file = f"{prefix}.index.bin"
            indices_file = f"{prefix}.indices.bin"
            if os.path.exists(index_file) and os.path.exists(indices_file):
                pos = PositionalIndex.load(index_file, indices_file)
                if slot_perm is not None:
                    # reference 13-mer CSR is slot-keyed; re-key by code
                    pos = pos.reorder(slot_perm)
                if kmer_size == 13:
                    idx.pos13 = pos
                else:
                    idx.pos23 = pos
            else:
                logger.warning("positional index files not found for %s", prefix)

        if load_reads:
            # reference pipelines key reads by the bare prefix (p.reads)
            # while index artifacts carry a k suffix (p.23.*): walk the
            # progressively extension-stripped prefixes instead of string-
            # replacing one hardcoded pattern
            candidates = [f"{prefix}.reads"]
            root, ext = os.path.splitext(prefix)
            while ext:
                candidates.append(f"{root}.reads")
                root, ext = os.path.splitext(root)
            reads_file = next((c for c in candidates if os.path.exists(c)),
                              None)
            if reads_file is not None:
                ridx = os.path.splitext(reads_file)[0] + ".ridx"
                idx.load_reads(reads_file, ridx if os.path.exists(ridx) else None)
            else:
                logger.warning("reads file not found for %s (tried %s)",
                               prefix, ", ".join(candidates))
        return idx

    @staticmethod
    def load_from_prefix_13mer(prefix: str, load_aindex: bool = True,
                               load_reads: bool = False) -> "AIndex":
        """13-mer prefix convenience (load_from_prefix_13mer,
        /root/reference/src/python_wrapper.cpp:1103-1132)."""
        return AIndex.load_from_prefix(prefix, kmer_size=13,
                                       load_aindex=load_aindex,
                                       load_reads=load_reads)

    @staticmethod
    def load_from_prefix_23mer(prefix: str, max_tf: int = 100000,
                               load_aindex: bool = True,
                               load_reads: bool = False) -> "AIndex":
        """23-mer prefix convenience (load_from_prefix_23mer,
        /root/reference/src/python_wrapper.cpp:1103-1132)."""
        return AIndex.load_from_prefix(prefix, kmer_size=23, max_tf=max_tf,
                                       load_aindex=load_aindex,
                                       load_reads=load_reads)

    def load(self, hash_file: str, tf_file: str, kmers_bin_file: str,
             kmers_text_file: str = "") -> None:
        """Load the 23-mer index from explicit artifact paths (the wrapper's
        ``load``, /root/reference/src/python_wrapper.cpp:228-245; the text
        k-mers file is accepted and ignored, as there)."""
        self.sparse23 = Sparse23Index.load_files(hash_file, tf_file,
                                                 kmers_bin_file)
        self._loaded = True

    load_hash_file = load
    load_hash = load  # aindex/core/aindex.py:63

    @staticmethod
    def load_13mer_index_static(hash_file: str, tf_file: str) -> "AIndex":
        """Static 13-mer constructor (aindex/core/aindex.py:382): the hash
        file is accepted for signature parity; the dense mode is
        code-indexed, so it is only used when it is a reference emphf .pf
        (slot-order table re-keyed on load)."""
        idx = AIndex()
        pf = None
        if hash_file and os.path.exists(hash_file):
            from aindex_tpu.index.emphf import EmphfPF
            if EmphfPF.is_emphf_file(hash_file):
                pf = hash_file
        idx.load_13mer_index(tf_file, pf)
        return idx

    def load_aindex_from_prefix_13mer(self, prefix: str) -> None:
        """/root/reference/src/python_wrapper.cpp:1156-1216."""
        self.load_13mer_aindex(prefix + ".index.bin", prefix + ".indices.bin")

    def load_aindex_from_prefix_23mer(self, prefix: str,
                                      max_tf: int = 100000,
                                      reads_file: str = "") -> None:
        """/root/reference/src/python_wrapper.cpp:1134-1154."""
        self.load_aindex(prefix + ".index.bin", prefix + ".indices.bin",
                         max_tf)
        if reads_file:
            self.load_reads(reads_file)

    def load_13mer_index(self, tf_file: str, pf_file: str | None = None) -> None:
        if not os.path.exists(tf_file):
            raise FileNotFoundError(f"13-mer tf file not found: {tf_file}")
        self.dense13 = Dense13Index.load(tf_file, pf_file)
        self._loaded = True

    def load_23mer_index(self, prefix: str) -> None:
        self.sparse23 = Sparse23Index.load(prefix)
        self._loaded = True

    def load_hash(self, hash_file: str, tf_file: str, kmers_bin_file: str,
                  kmers_text_file: str = "") -> None:
        """Load the sparse index from explicit artifact paths
        (aindex/core/aindex.py:63-100 ``load_hash``; the kmers_text file is
        validated-if-given but unused, exactly as there)."""
        for name, p in (("hash", hash_file), ("tf", tf_file),
                        ("kmers_bin", kmers_bin_file)):
            if not os.path.exists(p):
                raise FileNotFoundError(f"{name} file not found: {p}")
        if kmers_text_file and not os.path.exists(kmers_text_file):
            raise FileNotFoundError(
                f"kmers_text file not found: {kmers_text_file}")
        self.sparse23 = Sparse23Index.load_files(hash_file, tf_file,
                                                 kmers_bin_file)
        self._loaded = True

    #: alias kept for reference parity (aindex/core/aindex.py:81)
    load_hash_file = load_hash

    def load_13mer_aindex(self, index_file: str, indices_file: str) -> None:
        for name, p in (("index", index_file), ("indices", indices_file)):
            if not os.path.exists(p):
                raise FileNotFoundError(f"13-mer {name} file not found: {p}")
        self.pos13 = PositionalIndex.load(index_file, indices_file)

    def load_aindex(self, index_file: str, indices_file: str, max_tf: int = 100000) -> None:
        for name, p in (("index", index_file), ("indices", indices_file)):
            if not os.path.exists(p):
                raise FileNotFoundError(f"{name} file not found: {p}")
        self.pos23 = PositionalIndex.load(index_file, indices_file)
        self.max_tf = max_tf

    def load_reads(self, reads_file: str, ridx_file: str | None = None,
                   header_file: str | None = None) -> None:
        if not os.path.exists(reads_file):
            raise FileNotFoundError(f"Reads file not found: {reads_file}")
        if ridx_file is None:
            cand = os.path.splitext(reads_file)[0] + ".ridx"
            ridx_file = cand if os.path.exists(cand) else None
        self.reads = ReadsStore.from_reads_file(reads_file, ridx_file, header_file)

    # the engine always holds the blob in memory (the reference's mmap vs
    # in-memory distinction, /root/reference/src/python_wrapper.cpp:324-359)
    load_reads_in_memory = load_reads

    def load_reads_index(self, index_file: str,
                         header_file: str | None = None) -> None:
        """(Re)build the read-offset index from a .ridx (+ optional .header)
        for the already-loaded blob (aindex/core/aindex.py:101-130)."""
        self._require(self.reads, "reads")
        rows = np.loadtxt(index_file, dtype=np.int64, ndmin=2)
        self.reads.starts = rows[:, 1].copy()
        self.reads.ends = rows[:, 2].copy()
        if header_file and os.path.exists(header_file):
            headers = []
            with open(header_file) as fh:
                for line in fh:
                    headers.append(line.rstrip("\n").split("\t")[0])
            self.reads.headers = headers

    # ------------------------------------------------------------------
    # build (no subprocess pipeline needed for the in-process path)
    # ------------------------------------------------------------------

    @staticmethod
    def build_from_sequences(sequences: List[str], kmer_size: int = 23,
                             build_aindex: bool = True,
                             mesh=None) -> "AIndex":
        """In-process build. With ``mesh``, the counting phase runs
        data-parallel over the mesh (psum-merged dense table / key-sharded
        sparse spectrum) and the built index is placed via ``shard_to``."""
        idx = AIndex()
        store = ReadsStore.from_sequences(sequences)
        idx.reads = store
        if kmer_size == 13:
            idx.dense13 = Dense13Index.build_from_blob(store.blob, mesh=mesh)
            if build_aindex:
                idx.pos13 = PositionalIndex.build_dense13(store.blob,
                                                          tf=idx.dense13.tf)
        else:
            idx.sparse23 = Sparse23Index.build_from_blob(store.blob,
                                                         k=kmer_size, mesh=mesh)
            if build_aindex:
                idx.pos23 = PositionalIndex.build_sparse23(store.blob, idx.sparse23)
        idx._loaded = True
        if mesh is not None:
            idx.shard_to(mesh)
        return idx

    # ------------------------------------------------------------------
    # persistence
    # ------------------------------------------------------------------

    def save(self, prefix: str) -> None:
        """Write every loaded component's artifacts under ``prefix`` in the
        reference file formats (README.md:813-821): sparse -> .pf + .tf.bin
        + .kmers.bin, dense -> .tf.bin, positional -> .index.bin +
        .indices.bin, reads -> .reads + .ridx. The result round-trips
        through ``load_from_prefix``.

        A dual-mode index cannot share one prefix (both modes own .tf.bin /
        .index.bin — the reference uses distinct prefixes like p.13/p.23
        too): save each mode under its own prefix."""
        if self.sparse23 is not None and self.dense13 is not None:
            raise ValueError(
                "both index modes are loaded and their artifacts collide "
                "under one prefix; save each mode to its own prefix "
                "(e.g. p.13 / p.23)")
        if self.sparse23 is not None:
            self.sparse23.save(prefix)
        elif self.dense13 is not None:
            self.dense13.save(prefix + ".tf.bin")
        pos = self.pos23 if self.pos23 is not None else self.pos13
        if pos is not None:
            pos.save(prefix)
        if self.reads is not None:
            self.reads.save(prefix)

    # ------------------------------------------------------------------
    # dispatch helpers
    # ------------------------------------------------------------------

    def _mode_for(self, kmer: str):
        if len(kmer) == K13 and self.dense13 is not None:
            return self.dense13
        if self.sparse23 is not None and len(kmer) == self.sparse23.k:
            return self._sharded23 if self._sharded23 is not None \
                else self.sparse23
        return None

    @property
    def _engine23(self):
        """Active sparse query engine: the mesh-sharded one after
        shard_to(), else the single-device index. Every query family is
        served sharded (tf, both-directions, De Bruijn, coverage, pfid/
        hash/strand resolution) — only host-array consumers (save, stats,
        iteration, kid->kmer decode) read the unsharded host arrays."""
        return self._sharded23 if self._sharded23 is not None else self.sparse23

    @property
    def aindex_loaded(self) -> bool:
        return self.pos13 is not None or self.pos23 is not None

    @property
    def n_reads(self) -> int:
        return self.reads.n_reads if self.reads else 0

    @property
    def n_kmers(self) -> int:
        if self.sparse23 is not None:
            return self.sparse23.n
        if self.dense13 is not None:
            return SPACE_13
        return 0

    @property
    def reads_size(self) -> int:
        return self.reads.reads_size if self.reads else 0

    # ------------------------------------------------------------------
    # tf queries
    # ------------------------------------------------------------------

    def get_tf_value(self, kmer: str) -> int:
        if not self._loaded:
            return 0
        mode = self._mode_for(kmer)
        if mode is None:
            return 0
        return int(mode.get_tf_values([kmer])[0])

    def get_tf_values(self, kmers: List[str]) -> List[int]:
        if not self._loaded or not kmers:
            return [0] * len(kmers)
        k0 = len(kmers[0])
        if any(len(km) != k0 for km in kmers):
            # the whole batch dispatches on one mode; a mixed batch would
            # silently return zeros for the minority — reject instead (the
            # reference raises for the unloaded mode per call,
            # /root/reference/src/python_wrapper.cpp:644-664)
            raise ValueError(
                "get_tf_values: mixed k-mer lengths in one batch; "
                "split by length and call per mode")
        mode = self._mode_for(kmers[0])
        if mode is None:
            return [0] * len(kmers)
        return [int(v) for v in mode.get_tf_values(kmers)]

    def get_tf_values_13mer(self, kmers: List[str]) -> List[int]:
        self._require(self.dense13, "13-mer index")
        return [int(v) for v in self.dense13.get_tf_values(kmers)]

    def get_total_tf_value_13mer(self, kmer: str) -> int:
        self._require(self.dense13, "13-mer index")
        return int(self.dense13.get_total_tf_values([kmer])[0])

    def get_total_tf_values_13mer(self, kmers: List[str]) -> List[int]:
        self._require(self.dense13, "13-mer index")
        return [int(v) for v in self.dense13.get_total_tf_values(kmers)]

    def get_tf_both_directions_13mer(self, kmer: str) -> Tuple[int, int]:
        self._require(self.dense13, "13-mer index")
        fwd, rc = self.dense13.get_tf_both_directions([kmer])
        return int(fwd[0]), int(rc[0])

    def get_tf_both_directions_13mer_batch(self, kmers: List[str]) -> List[Tuple[int, int]]:
        self._require(self.dense13, "13-mer index")
        fwd, rc = self.dense13.get_tf_both_directions(kmers)
        return list(zip(fwd.tolist(), rc.tolist()))

    def get_tf_values_23mer(self, kmers: List[str]) -> List[int]:
        self._require(self.sparse23, "23-mer index")
        engine = self._engine23
        return [int(v) for v in engine.get_tf_values(kmers)]

    def get_total_tf_value_23mer(self, kmer: str) -> int:
        """fwd tf + revcomp tf. Both orientations resolve to the same
        canonical slot, so a present 23-mer totals 2x tf (23 is odd — no
        palindromic k-mers); matches the reference's two-probe sum
        (/root/reference/src/python_wrapper.cpp:1230-1251)."""
        return self.get_total_tf_values_23mer([kmer])[0]

    def get_total_tf_values_23mer(self, kmers: List[str]) -> List[int]:
        self._require(self.sparse23, "23-mer index")
        engine = self._engine23
        return [2 * int(v) for v in engine.get_tf_values(kmers)]

    # codes-in queries: device array in -> device uint32 array out. The
    # full-rate TPU entry points (no string encode, no host round-trip) —
    # encode once, keep codes on device, query at HBM-gather rate. These
    # are the paths the BENCH headline times.

    def get_tf_values_codes_13mer(self, codes, valid=None):
        self._require(self.dense13, "13-mer index")
        return self.dense13.get_tf_values_codes(codes, valid)

    def get_total_tf_values_codes_13mer(self, codes, valid=None):
        self._require(self.dense13, "13-mer index")
        return self.dense13.get_total_tf_values_codes(codes, valid)

    def get_tf_values_codes_23mer(self, codes, valid=None):
        self._require(self.sparse23, "23-mer index")
        # same engine routing as the ASCII paths: a shard_to()'d index
        # serves from the slot-sharded tables, never the unsharded copy
        engine = self._engine23
        return engine.get_tf_values_codes(codes, valid)

    def get_reverse_complement_13mer(self, kmer: str) -> str:
        return codec.revcomp(kmer)

    def get_reverse_complement_23mer(self, kmer: str) -> str:
        return codec.revcomp(kmer)

    def get_tf_both_directions_23mer(self, kmer: str) -> Tuple[int, int]:
        self._require(self.sparse23, "23-mer index")
        fwd, rc = self._engine23.get_tf_both_directions([kmer])
        return int(fwd[0]), int(rc[0])

    def get_tf_both_directions_23mer_batch(self, kmers: List[str]) -> List[Tuple[int, int]]:
        self._require(self.sparse23, "23-mer index")
        fwd, rc = self._engine23.get_tf_both_directions(kmers)
        return list(zip(fwd.tolist(), rc.tolist()))

    # dict protocol (aindex/core/aindex.py:249-264)

    def __len__(self) -> int:
        return self.get_hash_size()

    def __getitem__(self, kmer: str) -> int:
        return self.get_tf_value(kmer)

    def __contains__(self, kmer: str) -> bool:
        return self[kmer] > 0

    def get(self, kmer: str, default: int = 0) -> int:
        tf = self[kmer]
        return tf if tf > 0 else default

    # ------------------------------------------------------------------
    # identity / strand
    # ------------------------------------------------------------------

    def get_hash_value(self, kmer: str) -> int:
        self._require(self.sparse23, "23-mer index")
        return int(self._engine23.get_hash_values([kmer])[0])

    def get_hash_values(self, kmers: List[str]) -> List[int]:
        self._require(self.sparse23, "23-mer index")
        return [int(v) for v in self._engine23.get_hash_values(kmers)]

    def get_hash_size(self) -> int:
        if not self._loaded:
            raise RuntimeError("Index not loaded")
        return self.n_kmers

    def get_kid_by_kmer(self, kmer: str) -> int:
        """Verified slot of kmer or its revcomp; 0 when absent
        (/root/reference/src/python_wrapper.cpp:700-716)."""
        self._require(self.sparse23, "23-mer index")
        pfid = int(self._engine23.get_pfids([kmer])[0])
        return 0 if pfid >= self.sparse23.n else pfid

    def get_kmer_by_kid(self, kid: int) -> str:
        self._require(self.sparse23, "23-mer index")
        return self.sparse23.get_kmer_by_kid(kid)

    def get_strand(self, kmer: str) -> Strand:
        self._require(self.sparse23, "23-mer index")
        return Strand(int(self._engine23.get_strands([kmer])[0]))

    def get_kmer_info(self, kid: int) -> Tuple[str, str, int]:
        """(kmer, rkmer, tf) — aindex/core/aindex.py:196-208."""
        self._require(self.sparse23, "23-mer index")
        tf, kmer, rkmer = self.sparse23.get_kmer_info(kid)
        return kmer, rkmer, tf

    def get_kmer_info_by_kid(self, kid: int, k: int = 23):
        return self.get_kmer_info(kid)

    # ------------------------------------------------------------------
    # positions / reads resolution
    # ------------------------------------------------------------------

    def _positional_for(self, kmer: str) -> tuple[PositionalIndex, int] | None:
        """(positional index, slot) for a query k-mer, or None."""
        if len(kmer) == K13 and self.pos13 is not None:
            try:
                code = codec.encode_kmer(kmer)
            except ValueError:
                return None
            return self.pos13, code
        if self.pos23 is not None and self.sparse23 is not None \
                and len(kmer) == self.sparse23.k:
            pfid = int(self._engine23.get_pfids([kmer])[0])
            if pfid >= self.sparse23.n:
                return None
            return self.pos23, pfid
        return None

    def get_positions(self, kmer: str) -> List[int]:
        if len(kmer) not in (K13, K23):
            raise ValueError(
                f"Unsupported k-mer length: {len(kmer)}. Only 13-mers and "
                f"23-mers are supported.")
        hit = self._positional_for(kmer)
        if hit is None:
            return []
        pos_index, slot = hit
        return [int(p) for p in pos_index.positions_by_slot(slot)]

    def get_positions_13mer(self, kmer: str) -> List[int]:
        if self.pos13 is None:
            return []
        try:
            code = codec.encode_kmer(kmer)
        except ValueError:
            return []
        return [int(p) for p in self.pos13.positions_by_slot(code)]

    def pos(self, kmer: str) -> List[int]:
        return self.get_positions(kmer)

    def get_positions_batch(self, kmers: List[str]) -> List[List[int]]:
        """Positions for many k-mers in one vectorised pass (the reference
        loops get_positions per k-mer — its position-analysis bottleneck,
        /root/reference/src/python_wrapper.cpp:800-822). Same-length batch;
        dispatches like get_positions."""
        if not kmers:
            return []
        k0 = len(kmers[0])
        if any(len(km) != k0 for km in kmers):
            raise ValueError("get_positions_batch: mixed k-mer lengths")
        if k0 == K13 and self.pos13 is not None:
            codes, valid = codec.encode_kmers(kmers, K13)
            slots = np.where(valid, codes.astype(np.int64), -1)
            pindex = self.pos13
        elif self.pos23 is not None and self.sparse23 is not None \
                and k0 == self.sparse23.k:
            slots = self._engine23.get_pfids(kmers).astype(np.int64)
            slots = np.where(slots >= self.sparse23.n, -1, slots)
            pindex = self.pos23
        else:
            return [[] for _ in kmers]
        flat, lens = pindex.positions_by_slots(slots)
        splits = np.split(flat, np.cumsum(lens)[:-1])
        return [[int(p) for p in s] for s in splits]

    def get_rid(self, pos: int) -> int:
        self._require(self.reads, "reads")
        return int(self.reads.rid_by_pos(pos))

    def get_start(self, pos: int) -> int:
        self._require(self.reads, "reads")
        return self.reads.start_by_pos(pos)

    def get_rid2poses(self, kmer: str,
                      max_tf: Optional[int] = None) -> Dict[int, List[int]]:
        """kmer -> {rid: [in-read offsets]} (aindex/core/aindex.py:333-341).

        Results are complete by default — hub k-mers return every
        position, matching the reference (whose wrapper stores max_tf but
        never consults it, /root/reference/src/python_wrapper.cpp:134,365).
        Pass ``max_tf`` explicitly to bound the fan-out of hub k-mers
        (r4 silently applied the loader's max_tf here; silently different
        results for high-frequency k-mers is a bug report waiting to
        happen, so the cap is now opt-in)."""
        poses = self.pos(kmer)
        if max_tf is not None and len(poses) > max_tf:
            logger.warning(
                "get_rid2poses: hub k-mer with %d positions truncated to "
                "the explicit max_tf=%d", len(poses), max_tf)
            poses = poses[:max_tf]
        hits: Dict[int, List[int]] = defaultdict(list)
        for p in poses:
            rid = self.get_rid(p)
            start = int(self.reads.starts[rid])
            hits[rid].append(p - start)
        return dict(hits)

    def get_read_by_rid(self, rid: int) -> str:
        self._require(self.reads, "reads")
        return self.reads.get_read_by_rid(rid)

    def get_read(self, start: int, end: int, revcomp: bool = False) -> str:
        self._require(self.reads, "reads")
        return self.reads.get_read(start, end, revcomp)

    def get_reads_by_kmer(self, kmer: str, max_reads: int = 100) -> List[str]:
        """Single-end subreads containing the k-mer
        (get_reads_se_by_kmer, /root/reference/src/python_wrapper.cpp:857-911)."""
        self._require(self.reads, "reads")
        out, seen = [], set()
        for rid in self.get_rid2poses(kmer):
            if rid in seen or len(out) >= max_reads:
                continue
            seen.add(rid)
            read = self.get_read_by_rid(rid)
            for subread in read.split("~"):
                if kmer in subread or codec.revcomp(kmer) in subread:
                    out.append(subread)
                    if len(out) >= max_reads:
                        break
        return out

    get_reads_se_by_kmer = get_reads_by_kmer

    def debug_kmer_tf_values(self, slots: Optional[List[int]] = None) -> int:
        """Positional-index self-check (debug_kmer_tf_values,
        /root/reference/src/python_wrapper.cpp:913-935): for probe slots,
        assert the blob substring at every recorded position equals the
        slot's k-mer and that the position count is consistent with tf.

        Returns the number of positions verified; raises AssertionError on
        any inconsistency."""
        self._require(self.reads, "reads")
        verified = 0
        if self.pos23 is not None and self.sparse23 is not None:
            probe = slots or [1, 10, 100, 1000, 10000, 100000]
            for slot in probe:
                if slot >= self.sparse23.n:
                    continue
                kmer = self.sparse23.get_kmer_by_kid(slot)
                rkmer = codec.revcomp(kmer)
                tf = int(self.sparse23.tf_host[slot])
                poses = self.pos23.positions_by_slot(slot)
                assert len(poses) <= tf, \
                    f"slot {slot}: {len(poses)} positions > tf {tf}"
                for p in poses:
                    sub = self.get_read(int(p), int(p) + self.sparse23.k)
                    assert sub in (kmer, rkmer), \
                        f"slot {slot} pos {p}: blob has {sub!r}, want {kmer!r}"
                    verified += 1
        if self.pos13 is not None and self.dense13 is not None:
            probe = slots or [1, 10, 100, 1000, 10000, 100000]
            for code in probe:
                if code >= SPACE_13:
                    continue
                kmer = codec.decode_kmer(code, K13)
                for p in self.pos13.positions_by_slot(code):
                    sub = self.get_read(int(p), int(p) + K13)
                    assert sub == kmer, \
                        f"code {code} pos {p}: blob has {sub!r}, want {kmer!r}"
                    verified += 1
        return verified

    def iter_reads(self) -> Iterator[Tuple[int, str]]:
        self._require(self.reads, "reads")
        return self.reads.iter_reads()

    def iter_reads_se(self) -> Iterator[Tuple[int, int, str]]:
        self._require(self.reads, "reads")
        return self.reads.iter_reads_se()

    def get_header(self, pos: int) -> Optional[str]:
        if self.reads is None or self.reads.headers is None:
            return None
        rid = int(self.reads.rid_by_pos(pos))
        return self.reads.headers[rid] if rid < len(self.reads.headers) else ""

    def get_reads_size(self) -> int:
        return self.reads_size

    # ------------------------------------------------------------------
    # sequence analytics
    # ------------------------------------------------------------------

    def iter_sequence_kmers(self, sequence: str, k: int = 23
                            ) -> Iterator[Tuple[str, int]]:
        for i in range(len(sequence) - k + 1):
            kmer = sequence[i:i + k]
            if "\n" in kmer or "~" in kmer:
                continue
            yield kmer, self[kmer]

    def _coverage_k(self, k: Optional[int]) -> int:
        """Resolve the coverage k-mer size: explicit k, else the loaded
        mode (sparse when both are loaded, matching the reference's
        default K=23, aindex/core/aindex.py:314-322)."""
        if k is not None:
            return k
        if self.sparse23 is not None:
            return self.sparse23.k
        if self.dense13 is not None:
            return K13
        return K23

    def get_sequence_coverage(self, seq: str, cutoff: int = 0,
                              k: Optional[int] = None) -> List[int]:
        k = self._coverage_k(k)
        if k == K13 and self.dense13 is not None:
            return [int(v) for v in self.dense13.sequence_coverage(seq, cutoff)]
        if self.sparse23 is not None and k == self.sparse23.k:
            return [int(v) for v in self._engine23.sequence_coverage(seq, cutoff)]
        return [0] * max(0, len(seq) - k + 1)

    def get_sequence_coverage_batch(self, seqs: List[str], cutoff: int = 0,
                                    k: Optional[int] = None) -> List[List[int]]:
        """Coverage profiles for many sequences — the high-throughput path
        (length-bucketed device batches)."""
        k = self._coverage_k(k)
        if k == K13 and self.dense13 is not None:
            covs = self.dense13.sequence_coverage_batch(seqs, cutoff)
        elif self.sparse23 is not None and k == self.sparse23.k:
            covs = self._engine23.sequence_coverage_batch(seqs, cutoff)
        else:
            return [[0] * max(0, len(s) - k + 1) for s in seqs]
        return [[int(v) for v in c] for c in covs]

    def print_sequence_coverage(self, seq: str, cutoff: int = 0) -> List[int]:
        k = self._coverage_k(None)
        coverage = self.get_sequence_coverage(seq, cutoff)
        for i, tf in enumerate(coverage):
            print(f"{i}\t{seq[i:i + k]}\t{tf}")
        return coverage

    # ------------------------------------------------------------------
    # frequency iteration / stats
    # ------------------------------------------------------------------

    def _index_to_13mer(self, index: int) -> str:
        return codec.decode_kmer(index, K13)

    def iter_kmers_by_frequency(self, min_tf: int = 1,
                                max_kmers: Optional[int] = None,
                                kmer_type: str = "auto"
                                ) -> Iterator[Tuple[str, int]]:
        """K-mers sorted by decreasing tf (aindex/core/aindex.py:594-681),
        vectorised with argsort instead of the reference's Python loop."""
        if not self._loaded:
            raise RuntimeError("Index not loaded")
        if kmer_type == "auto":
            kmer_type = "13mer" if self.dense13 is not None else "23mer"
        if kmer_type == "13mer":
            self._require(self.dense13, "13-mer index")
            tf = self.dense13.tf_host
            idx = np.flatnonzero(tf >= min_tf)
            order = np.argsort(tf[idx], kind="stable")[::-1]
            idx = idx[order]
            if max_kmers is not None:
                idx = idx[:max_kmers]
            block = 1 << 16
            for start in range(0, len(idx), block):
                codes = idx[start:start + block]
                kmers = codec.decode_kmers(codes.astype(np.uint64), K13)
                for kmer, count in zip(kmers, tf[codes]):
                    yield kmer, int(count)
        elif kmer_type == "23mer":
            self._require(self.sparse23, "23-mer index")
            tf = self.sparse23.tf_host
            idx = np.flatnonzero(tf >= min_tf)
            order = np.argsort(tf[idx], kind="stable")[::-1]
            idx = idx[order]
            if max_kmers is not None:
                idx = idx[:max_kmers]
            codes = self.sparse23.checker_host[idx]
            kmers = codec.decode_kmers(codes, self.sparse23.k) if len(idx) else []
            for kmer, count in zip(kmers, tf[idx]):
                yield kmer, int(count)
        else:
            raise ValueError(f"Unsupported kmer_type: {kmer_type}")

    def get_top_kmers(self, n: int = 100, min_tf: int = 1,
                      kmer_type: str = "auto") -> List[Tuple[str, int]]:
        return list(self.iter_kmers_by_frequency(min_tf=min_tf, max_kmers=n,
                                                 kmer_type=kmer_type))

    def get_kmer_frequency_stats(self, kmer_type: str = "auto") -> Dict[str, Any]:
        if not self._loaded:
            raise RuntimeError("Index not loaded")
        if kmer_type == "auto":
            kmer_type = "13mer" if self.dense13 is not None else "23mer"
        if kmer_type == "13mer":
            self._require(self.dense13, "13-mer index")
            tf = self.dense13.tf_host
        else:
            self._require(self.sparse23, "23-mer index")
            tf = self.sparse23.tf_host
        nz = tf[tf > 0]
        return {
            "kmer_type": kmer_type,
            "total_kmers": int(tf.size),
            "non_zero_kmers": int(nz.size),
            "zero_kmers": int(tf.size - nz.size),
            "max_tf": int(nz.max()) if nz.size else 0,
            "min_tf": int(nz.min()) if nz.size else 0,
            "avg_tf": float(nz.mean()) if nz.size else 0.0,
            "total_tf": int(tf.sum(dtype=np.uint64)),
            "coverage": float(nz.size / tf.size) if tf.size else 0.0,
        }

    def get_13mer_statistics(self) -> Dict[str, int]:
        self._require(self.dense13, "13-mer index")
        return self.dense13.stats()

    def get_23mer_statistics(self) -> Dict[str, int]:
        self._require(self.sparse23, "23-mer index")
        return self.sparse23.stats()

    def set_stats(self, coverage: int) -> Dict:
        """Coverage-profile statistics of the loaded index: zero/unique/
        distinct/total/max_count + the clamped tf histogram ``profile``
        (set_stats, /root/reference/src/hash.hpp:297-323). Served by
        whichever mode is loaded (sparse preferred, as in the reference)."""
        idx = self.sparse23 if self.sparse23 is not None else self.dense13
        self._require(idx, "index")
        return idx.set_stats(coverage)

    def print_and_set_coverage(self, coverage: int) -> str:
        """The reference's profile print + one-line summary
        (print_and_set_coverage, /root/reference/src/hash.hpp:337-349)."""
        from aindex_tpu.core.stats import format_stats
        s = self.set_stats(coverage)
        print(" ".join(f"{i}:{int(v)}" for i, v in enumerate(s["profile"])))
        line = format_stats(s)
        print(line)
        return line

    def save_values(self, path: str, skip_zeros: bool = True
                    ) -> Tuple[int, int, int]:
        """Slot-ordered ``kmer\\ttf`` text dump of the loaded index;
        returns (zeros, ones, other) tallies (save_values,
        /root/reference/src/hash.hpp:261-289)."""
        idx = self.sparse23 if self.sparse23 is not None else self.dense13
        self._require(idx, "index")
        return idx.save_values(path, skip_zeros)

    def get_13mer_tf_array(self) -> np.ndarray:
        self._require(self.dense13, "13-mer index")
        return self.dense13.get_tf_array()

    def get_tf_by_index_13mer(self, index: int) -> int:
        self._require(self.dense13, "13-mer index")
        return self.dense13.get_tf_by_index(index)

    def get_index_info(self) -> str:
        parts = []
        if self.dense13 is not None:
            s = self.dense13.stats()
            parts.append(
                f"13-mer dense index: {s['non_zero_kmers']}/{s['total_kmers']} "
                f"non-zero, max tf {s['max_frequency']}, total {s['total_count']}")
        if self.sparse23 is not None:
            s = self.sparse23.stats()
            parts.append(
                f"{self.sparse23.k}-mer sparse index: {s['total_kmers']} kmers, "
                f"max tf {s['max_frequency']}, total {s['total_count']}")
        if self.reads is not None:
            parts.append(f"reads: {self.n_reads} ({self.reads_size} bytes)")
        if self.aindex_loaded:
            parts.append("positional index: loaded")
        return "\n".join(parts) if parts else "no index loaded"

    # ------------------------------------------------------------------
    # De Bruijn continuation
    # ------------------------------------------------------------------

    def debruijn_next(self, kmer: str, cutoff: int = 0) -> Dict[str, int]:
        """tf of the 4 right extensions, keyed by base
        (/root/reference/src/debrujin.cpp:30-75)."""
        self._require(self.sparse23, "23-mer index")
        row = self._engine23.debruijn_next([kmer], cutoff)[0]
        return dict(zip("ACGT", (int(v) for v in row)))

    def debruijn_prev(self, kmer: str, cutoff: int = 0) -> Dict[str, int]:
        self._require(self.sparse23, "23-mer index")
        row = self._engine23.debruijn_prev([kmer], cutoff)[0]
        return dict(zip("ACGT", (int(v) for v in row)))

    def _cont_dict(self, info: dict, i: int) -> dict:
        return {
            "A": int(info["tf"][i, 0]), "C": int(info["tf"][i, 1]),
            "G": int(info["tf"][i, 2]), "T": int(info["tf"][i, 3]),
            "n": int(info["n"][i]), "sum": int(info["sum"][i]),
            "best_hit": str(info["best_hit"][i]),
            "best_hit_tf": int(info["best_hit_tf"][i]),
            "best_ukmer": int(info["best_ukmer"][i]),
        }

    def debruijn_next_info(self, kmer: str, cutoff: int = 0) -> Dict:
        """Full CONT record of print_next
        (/root/reference/src/debrujin.hpp:14-34): the 4 extension tfs plus
        n, sum, best_hit/best_hit_tf/best_ukmer (reference tie rule: the
        last base in ACGT order among the maxima wins)."""
        self._require(self.sparse23, "23-mer index")
        return self._cont_dict(self._engine23.debruijn_next_info([kmer],
                                                                cutoff), 0)

    def debruijn_prev_info(self, kmer: str, cutoff: int = 0) -> Dict:
        self._require(self.sparse23, "23-mer index")
        return self._cont_dict(self._engine23.debruijn_prev_info([kmer],
                                                                cutoff), 0)

    def debruijn_next_info_batch(self, kmers: List[str],
                                 cutoff: int = 0) -> List[Dict]:
        self._require(self.sparse23, "23-mer index")
        info = self._engine23.debruijn_next_info(kmers, cutoff)
        return [self._cont_dict(info, i) for i in range(len(kmers))]

    def debruijn_prev_info_batch(self, kmers: List[str],
                                 cutoff: int = 0) -> List[Dict]:
        self._require(self.sparse23, "23-mer index")
        info = self._engine23.debruijn_prev_info(kmers, cutoff)
        return [self._cont_dict(info, i) for i in range(len(kmers))]

    # ------------------------------------------------------------------

    @staticmethod
    def _require(obj, what: str):
        if obj is None:
            raise RuntimeError(f"{what} not loaded")

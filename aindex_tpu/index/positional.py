"""Positional "aindex": CSR mapping k-mer slot -> every blob position.

The reference fills this with per-slot atomic write cursors — racy ordering
(/root/reference/src/hash.cpp:1024-1051, src/compute_aindex13.cpp:206-215).
The TPU-native build is sort-based and deterministic (SURVEY.md section 7.4):
emit (slot, position) pairs from the windowing kernel, argsort by slot, and
derive CSR offsets from the slot histogram. Positions within a slot come out
sorted ascending — stricter than the reference's nondeterministic order.

On-disk format matches the reference: ``.index.bin`` = uint64 positions
(1-based, 0 = empty), ``.indices.bin`` = uint64 CSR offsets[n_slots+1]
(/root/reference/src/hash.hpp:470-486, queries at
src/python_wrapper.cpp:800-822 return 0-based and skip zeros).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import numpy as np

from aindex_tpu.constants import SPACE_13, SUFFIX_INDEX, SUFFIX_INDICES
from aindex_tpu.core.reads import blob_chunks
from aindex_tpu.index.sparse23 import Sparse23Index, _extract_windows
from aindex_tpu.kernels.encode import ascii_to_base_codes, window_codes


class PositionalIndex:
    def __init__(self, offsets: np.ndarray, positions: np.ndarray):
        self.offsets = np.asarray(offsets, dtype=np.uint64)    # [n_slots + 1]
        self.positions = np.asarray(positions, dtype=np.uint64)  # 1-based

    @property
    def n_slots(self) -> int:
        return len(self.offsets) - 1

    @property
    def total(self) -> int:
        return len(self.positions)

    @property
    def max_tf(self) -> int:
        if self.n_slots == 0:
            return 0
        return int(np.max(np.diff(self.offsets.astype(np.int64))))

    # -- construction ------------------------------------------------------

    @classmethod
    def from_slot_positions(cls, slots: np.ndarray, positions0: np.ndarray,
                            n_slots: int) -> "PositionalIndex":
        """slots int64[n] (slot per occurrence), positions0 int64[n] 0-based."""
        order = np.argsort(slots, kind="stable")
        sorted_pos = positions0[order].astype(np.uint64) + np.uint64(1)
        counts = np.bincount(slots, minlength=n_slots).astype(np.uint64)
        offsets = np.zeros(n_slots + 1, dtype=np.uint64)
        np.cumsum(counts, out=offsets[1:])
        return cls(offsets, sorted_pos)

    @classmethod
    def build_dense13(cls, blob: np.ndarray, k: int = 13,
                      chunk: int = 1 << 22) -> "PositionalIndex":
        """13-mer positional index: slot = forward 2-bit code (the reference
        does a forward-only MPHF lookup per position,
        /root/reference/src/compute_aindex13.cpp:137-149)."""
        slot_parts, pos_parts = [], []
        for piece, off in blob_chunks(blob, k, chunk):
            base = ascii_to_base_codes(jnp.asarray(piece))
            codes, valid = window_codes(base, k, out_dtype=jnp.uint32)
            valid_np = np.asarray(valid)
            codes_np = np.asarray(codes)[valid_np].astype(np.int64)
            if codes_np.size:
                slot_parts.append(codes_np)
                pos_parts.append(np.flatnonzero(valid_np).astype(np.int64) + off)
        if not slot_parts:
            return cls(np.zeros(SPACE_13 + 1, np.uint64), np.zeros(0, np.uint64))
        return cls.from_slot_positions(np.concatenate(slot_parts),
                                       np.concatenate(pos_parts), 4 ** k)

    @classmethod
    def build_sparse23(cls, blob: np.ndarray, index: Sparse23Index,
                       chunk: int = 1 << 22) -> "PositionalIndex":
        """23-mer positional index: slot = verified canonical MPHF slot
        (/root/reference/src/hash.cpp:960-1060 lu_compressed_worker)."""
        k = index.k
        slot_parts, pos_parts = [], []
        for piece, off in blob_chunks(blob, k, chunk):
            codes, valid = _extract_windows(jnp.asarray(piece), k)
            _, slot, _ = index._resolve(codes, valid)
            slot_np = np.asarray(slot).astype(np.int64)
            keep = slot_np >= 0
            if keep.any():
                slot_parts.append(slot_np[keep])
                pos_parts.append(np.flatnonzero(keep).astype(np.int64) + off)
        if not slot_parts:
            return cls(np.zeros(index.n + 1, np.uint64), np.zeros(0, np.uint64))
        return cls.from_slot_positions(np.concatenate(slot_parts),
                                       np.concatenate(pos_parts), index.n)

    def reorder(self, old_slot_for_new: np.ndarray) -> "PositionalIndex":
        """CSR with rows permuted: new slot j holds old slot
        ``old_slot_for_new[j]``'s positions. Used to reorder a reference-built
        13-mer positional index (MPHF-slot keyed,
        /root/reference/src/compute_aindex13.cpp:206-215) into k-mer code
        order at load time."""
        old = np.asarray(old_slot_for_new, dtype=np.int64)
        off = self.offsets.astype(np.int64)
        lens = (off[1:] - off[:-1])[old]
        new_off = np.zeros(len(old) + 1, dtype=np.int64)
        np.cumsum(lens, out=new_off[1:])
        total = int(new_off[-1])
        # vectorised segment gather: absolute source index per output element
        src = (np.arange(total, dtype=np.int64)
               - np.repeat(new_off[:-1], lens)
               + np.repeat(off[:-1][old], lens))
        return PositionalIndex(new_off.astype(np.uint64), self.positions[src])

    # -- persistence ---------------------------------------------------

    def save(self, prefix: str) -> None:
        self.positions.tofile(prefix + SUFFIX_INDEX)
        self.offsets.tofile(prefix + SUFFIX_INDICES)

    @classmethod
    def load(cls, index_path: str, indices_path: str) -> "PositionalIndex":
        positions = np.fromfile(index_path, dtype=np.uint64)
        offsets = np.fromfile(indices_path, dtype=np.uint64)
        return cls(offsets, positions)

    # -- queries ---------------------------------------------------------

    def positions_by_slot(self, slot: int) -> np.ndarray:
        """0-based blob positions for a slot (zeros skipped, as in
        /root/reference/src/python_wrapper.cpp:800-822)."""
        if slot < 0 or slot >= self.n_slots:
            return np.zeros(0, dtype=np.uint64)
        s, e = int(self.offsets[slot]), int(self.offsets[slot + 1])
        chunk = self.positions[s:e]
        return chunk[chunk > 0] - np.uint64(1)

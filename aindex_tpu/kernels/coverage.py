"""Per-position sequence coverage kernels.

Coverage of a sequence = tf of the k-mer starting at each position
(aindex/core/aindex.py:314-322). The reference loops per position with one
hash per k-mer; here the whole profile is one fused device computation:
LUT gather -> k shift-or window packing -> table gather(s) -> cutoff mask.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from aindex_tpu.kernels.encode import (ascii_to_base_codes,
                                       packed_window_codes, window_codes)


@functools.partial(jax.jit, static_argnames=("k",))
def _coverage_dense_kernel(table: jax.Array, ascii_u8: jax.Array, cutoff: jax.Array,
                           k: int) -> jax.Array:
    base = ascii_to_base_codes(ascii_u8)
    codes, valid = window_codes(base, k, out_dtype=jnp.uint32)
    tf = table[codes.astype(jnp.int32)]
    tf = jnp.where(valid, tf, jnp.zeros((), tf.dtype))
    return jnp.where(tf >= cutoff, tf, jnp.zeros((), tf.dtype))


@functools.partial(jax.jit, static_argnames=("k", "rows", "stride"))
def _coverage_dense_packed(table: jax.Array, packed: jax.Array,
                           vbits: jax.Array, cutoff: jax.Array, *, k: int,
                           rows: int, stride: int) -> jax.Array:
    """Packed-ingest batch coverage: the caller flattens the
    [rows, stride-1] ASCII matrix with a newline column (+ >= k newline
    tail) into the 0.375 B/base packed format — the H2D of the raw batch
    is what bounds coverage on slow links. Returns [rows, stride-k]."""
    codes, valid = packed_window_codes(packed, vbits, k,
                                       out_dtype=jnp.uint32)
    need = rows * stride
    tf = table[codes[:need].astype(jnp.int32)]
    tf = jnp.where(valid[:need], tf, jnp.zeros((), tf.dtype))
    tf = jnp.where(tf >= cutoff, tf, jnp.zeros((), tf.dtype))
    return tf.reshape(rows, stride)[:, : stride - k]


def coverage_dense(table: jax.Array, seq: str, k: int, cutoff: int = 0) -> np.ndarray:
    """Forward-strand coverage against a dense code-indexed table (13-mer)."""
    ascii_u8 = np.frombuffer(seq.encode("ascii"), dtype=np.uint8)
    if ascii_u8.size < k:
        return np.zeros(0, dtype=np.uint32)
    out = _coverage_dense_kernel(table, jnp.asarray(ascii_u8),
                                 jnp.uint32(cutoff), k)
    return np.asarray(out)


def _length_bucket(n: int, k: int) -> int:
    """Pad length to a power-of-2 bucket (>=128) so jit caches stay small."""
    b = 128
    while b < n:
        b <<= 1
    return max(b, k)


def coverage_dense_batch(table: jax.Array, seqs: list[str], k: int,
                         cutoff: int = 0) -> list[np.ndarray]:
    """Coverage profiles for a batch of sequences in few device calls.

    Sequences are grouped into power-of-2 length buckets and padded with
    newline bytes (invalid windows), so at most O(log max_len) program
    shapes are ever compiled — the throughput path behind the reference's
    "sequence coverage analysis" benchmark (BASELINE.md).
    """
    out: list[np.ndarray | None] = [None] * len(seqs)
    buckets: dict[int, list[int]] = {}
    for i, s in enumerate(seqs):
        if len(s) < k:
            out[i] = np.zeros(0, dtype=np.uint32)
        else:
            buckets.setdefault(_length_bucket(len(s), k), []).append(i)
    from aindex_tpu.core import codec
    for blen, members in buckets.items():
        rows = 8
        while rows < len(members):
            rows <<= 1
        mat = np.full((rows, blen + 1), ord("\n"), dtype=np.uint8)
        for row, i in enumerate(members):
            enc = np.frombuffer(seqs[i].encode("ascii"), dtype=np.uint8)
            mat[row, :len(enc)] = enc
        flat = np.concatenate([mat.ravel(),
                               np.full(k, ord("\n"), np.uint8)])
        packed, vbits = codec.pack_ascii_chunk(flat)
        cov = np.asarray(_coverage_dense_packed(
            table, jnp.asarray(packed), jnp.asarray(vbits),
            jnp.uint32(cutoff), k=k, rows=rows, stride=blen + 1))
        for row, i in enumerate(members):
            out[i] = cov[row, :len(seqs[i]) - k + 1]
    return out  # type: ignore[return-value]

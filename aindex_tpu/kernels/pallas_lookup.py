"""Pallas TPU kernel: shard-streaming batched table gather.

The batched tf query is one random HBM gather per key (kernels/lookup.py).
Random single-element access pays full-sector latency per key, so for large
batches it can be faster to *stream* the dense table through VMEM once per
codes tile and select hits on the VPU — turning a latency-bound gather into
a bandwidth/ALU-bound sweep. This kernel implements that trade:

  grid = (B / TILE, n_shards); each step DMAs one table shard
  (SHARD_ROWS x 128 entries) into VMEM, gathers the rows addressed by the
  resident codes tile, selects the in-row element with a one-hot reduce,
  and accumulates into the resident output tile (zero outside the shard).

Whether this beats the XLA gather depends on batch size and table width —
``gather_tf_auto`` runs a short on-device timing race at first use and
picks the winner (cached per (table id, batch shape)).

The kernel is exact for any uint8/uint16/uint32 table: the packed int32
word array is zero-padded up to a whole number of shards, and padded words
are never selected because codes address only real table entries. The dense
13-mer table (4^13 entries, /root/reference/src/count_kmers13.cpp:27) packs
to a whole shard count with no padding at any width.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128          # last-dim tile width on TPU
SHARD_ROWS = 8192    # int32-word rows per table shard => 4 MB of VMEM
TILE_ROWS = 2048     # codes-tile rows => 262,144 codes per grid step
SUB_ROWS = 32        # rows per inner gather sub-tile => 4096 codes


def _gather_kernel(codes_ref, table_ref, out_ref, *, shard_rows: int,
                   log2_epw: int, elem_bits: int):
    """One (codes tile, table shard) step: masked gather-accumulate.

    Works entirely in int32 — this Mosaic version cannot lower narrow<->wide
    integer converts (its _convert_helper self-recurses), so the caller packs
    the table into int32 words (``epw`` = elements per word) and we extract
    the addressed element with shifts/masks on the VPU.
    """
    s = pl.program_id(1)
    row_base = s * shard_rows

    @pl.when(s == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    n_sub = codes_ref.shape[0] // SUB_ROWS
    sub_b = SUB_ROWS * LANES
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (sub_b, LANES), 1)
    elem_mask = (1 << elem_bits) - 1 if elem_bits < 32 else None

    def body(i, _):
        codes = codes_ref[pl.ds(i * SUB_ROWS, SUB_ROWS), :]   # (SUB_ROWS, 128)
        word_idx = jax.lax.shift_right_logical(codes, jnp.int32(log2_epw))
        row = jax.lax.shift_right_logical(word_idx, jnp.int32(7)) - row_base
        col = (word_idx & jnp.int32(127)).reshape(sub_b, 1)
        in_shard = (row >= 0) & (row < shard_rows)
        safe_row = jnp.where(in_shard, row, 0).reshape(sub_b)
        rows = jnp.take(table_ref[:], safe_row, axis=0)        # (sub_b, 128)
        onehot = lane_iota == col
        word = jnp.sum(jnp.where(onehot, rows, 0), axis=1,
                       dtype=jnp.int32).reshape(SUB_ROWS, LANES)
        if elem_mask is not None:            # select sub-word element
            sub = codes & jnp.int32((1 << log2_epw) - 1)
            word = jax.lax.shift_right_logical(
                word, sub * jnp.int32(elem_bits)) & jnp.int32(elem_mask)
        out_ref[pl.ds(i * SUB_ROWS, SUB_ROWS), :] += jnp.where(
            in_shard, word, jnp.zeros((), jnp.int32))
        return 0

    jax.lax.fori_loop(0, n_sub, body, 0)


_ITEMSIZE = {"uint8": 1, "int8": 1, "uint16": 2, "int16": 2,
             "uint32": 4, "int32": 4}


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_tf_pallas(table: jax.Array, codes: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """out[i] = table[codes[i]] via shard-streaming; exact XLA-gather drop-in.

    ``table`` is uint8/uint16/uint32 of any size (zero-padded on device to a
    whole shard count); ``codes`` any integer dtype, values in
    [0, table.size). Output is uint32.
    """
    itemsize = _ITEMSIZE.get(str(table.dtype))
    if itemsize is None:
        raise ValueError(f"unsupported table dtype {table.dtype}")
    epw = 4 // itemsize                          # elements per int32 word
    log2_epw = epw.bit_length() - 1
    # zero-pad to a whole number of shards (in elements); padded entries are
    # unreachable because codes address only [0, table.size)
    shard_elems = SHARD_ROWS * LANES * epw
    pad_elems = (-table.size) % shard_elems
    if pad_elems:
        table = jnp.pad(table, (0, pad_elems))
    n_shards = table.size // shard_elems
    # pack into int32 words: bitcast groups of epw narrow elements
    if epw > 1:
        words = jax.lax.bitcast_convert_type(
            table.reshape(-1, epw), jnp.int32).reshape(-1)
    else:
        words = jax.lax.bitcast_convert_type(table, jnp.int32)
    table2d = words.reshape(-1, LANES)

    b = codes.shape[0]
    tile = TILE_ROWS * LANES
    pad = (-b) % tile
    codes_p = jnp.pad(codes.astype(jnp.int32), (0, pad)).reshape(-1, LANES)
    n_btiles = codes_p.shape[0] // TILE_ROWS

    out = pl.pallas_call(
        functools.partial(_gather_kernel, shard_rows=SHARD_ROWS,
                          log2_epw=log2_epw, elem_bits=8 * itemsize),
        out_shape=jax.ShapeDtypeStruct(codes_p.shape, jnp.int32),
        grid=(n_btiles, n_shards),
        in_specs=[
            pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((SHARD_ROWS, LANES), lambda i, s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_ROWS, LANES), lambda i, s: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(codes_p, table2d)
    return out.reshape(-1)[:b].astype(jnp.uint32)


# ---------------------------------------------------------------------------
# adaptive implementation choice
# ---------------------------------------------------------------------------

_impl_cache: dict[tuple, str] = {}


def _time_call(fn, *args, reps: int = 3) -> float:
    """Time fn(*args), forcing completion via an 8-byte scalar readback —
    on some backends (the tunneled dev TPU) ``block_until_ready`` returns
    before execution finishes, so a host readback is the only reliable
    fence; reading back the full result would measure the tunnel instead."""
    import time

    def forced(*a):  # un-jitted wrapper: nesting jit around a pallas_call
        return float(jnp.sum(fn(*a).astype(jnp.uint32)))  # blows the tracer

    forced(*args)  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        forced(*args)
        best = min(best, time.perf_counter() - t0)
    return best


def gather_tf_auto(table: jax.Array, codes: jax.Array) -> jax.Array:
    """table[codes] using the faster of XLA gather / pallas shard-streaming.

    The pallas path only competes for large batches on the TPU backend; the
    first call per (backend, table size/dtype, batch bucket) runs both once
    and remembers the winner. Any pallas failure (e.g. lowering on an older
    backend) permanently falls back to the XLA gather.
    """
    backend = jax.default_backend()
    itemsize = _ITEMSIZE.get(str(table.dtype))
    if backend != "tpu" or codes.shape[0] < (1 << 20) or itemsize is None:
        return table[codes.astype(jnp.int32)]
    key = (backend, table.size, str(table.dtype), codes.shape[0])
    impl = _impl_cache.get(key)
    if impl is None:
        try:
            t_pallas = _time_call(gather_tf_pallas, table, codes)
            t_xla = _time_call(
                jax.jit(lambda t, c: t[c.astype(jnp.int32)]), table, codes)
            impl = "pallas" if t_pallas < t_xla else "xla"
        except Exception:  # lowering/compile failure -> XLA forever
            impl = "xla"
        _impl_cache[key] = impl
    if impl == "pallas":
        return gather_tf_pallas(table, codes).astype(table.dtype)
    return table[codes.astype(jnp.int32)]

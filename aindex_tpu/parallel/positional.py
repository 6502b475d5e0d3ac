"""Mesh-parallel positional-index build: slot-range-sharded CSR fill.

The reference parallelises this phase with per-slot atomic write cursors
over threads (lu_compressed_worker, /root/reference/src/hash.cpp:960-1060).
The mesh formulation keeps the deterministic sort-based fill of
aindex_tpu.index.positional and adds two axes of parallelism:

* data: each device extracts windows and resolves slots for its OWN blob
  chunk (batch rows shard over the ``data`` axis);
* index: the CSR positions array is sharded by equal slot ranges — shard d
  owns slots [d*m, (d+1)*m) and the corresponding positions segment. One
  ``all_gather`` per batch hands every device the full (slot, position)
  pair stream, from which it keeps and scatters only its own range.

all_gather of the fixed-size pair stream replaces a variable-split
all-to-all (XLA collectives need static shapes). The scatter itself is the
same rank-in-run kernel as the single-device build
(positional._scatter_chunk), and chunk offsets ascend with the gather's
device order, so the assembled result is byte-identical to the
single-device build — parity is tested at 1/2/4/8 devices.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aindex_tpu.parallel.mesh import DATA_AXIS


def _range_layout(offsets: np.ndarray, n_slots: int, n_data: int):
    """Equal slot ranges per shard: d owns [d*m, (d+1)*m).

    Returns (m, seg_len[n_data], L, loc[n_data, m]): ``loc`` is each
    shard's slot->local-cell offset table (rebased to its segment start);
    slots past n_slots (range padding) point past every buffer and any
    stray scatter drops.
    """
    m = max(1, -(-n_slots // n_data))
    bounds = np.minimum(np.arange(n_data + 1, dtype=np.int64) * m, n_slots)
    seg_len = offsets[bounds[1:]] - offsets[bounds[:-1]]
    L = max(int(seg_len.max()) if seg_len.size else 0, 1)
    loc = np.full((n_data, m), L, dtype=np.int64)
    for d in range(n_data):
        lo, hi = bounds[d], bounds[d + 1]
        loc[d, :hi - lo] = offsets[lo:hi] - offsets[lo]
    return m, seg_len.astype(np.int64), L, loc


def build_positional_sharded(blob: np.ndarray, n_slots: int, tf,
                             resolve_slots, mesh: Mesh, k: int,
                             chunk: int = 1 << 22, on_progress=None):
    """Data-parallel, slot-range-sharded positional CSR build.

    ``resolve_slots(codes_u64, valid) -> int slot per window (-1 = absent
    / invalid)`` must be pure JAX — it is traced inside the per-device
    shard (dense13: the code itself; sparse23: the verified cuckoo/MPHF
    probe). ``tf`` is the per-slot occurrence histogram from the counting
    phase (host or device; materialised host-side for the offsets, as the
    single-device builder also does on return).
    """
    from aindex_tpu.core.codec import pack_ascii_chunk
    from aindex_tpu.core.reads import blob_chunk_batches
    from aindex_tpu.index.positional import PositionalIndex, _scatter_chunk
    from aindex_tpu.kernels.encode import packed_window_codes
    from aindex_tpu.parallel import distributed as dist

    n_data = mesh.shape[DATA_AXIS]
    rows = dist.local_data_rows(mesh) if dist.is_multiprocess() \
        else range(n_data)
    offsets = np.zeros(n_slots + 1, dtype=np.int64)
    np.cumsum(np.asarray(tf, dtype=np.int64), out=offsets[1:])
    total = int(offsets[-1])
    if total == 0 or blob.size < k:
        return PositionalIndex(offsets.astype(np.uint64),
                               np.zeros(0, np.uint64))
    m, seg_len, L, loc = _range_layout(offsets, n_slots, n_data)

    data = NamedSharding(mesh, P(DATA_AXIS))
    positions = jax.jit(lambda: jnp.zeros((n_data, L), jnp.uint64),
                        out_shardings=data)()
    cursor = jax.jit(lambda: jnp.zeros((n_data, m), jnp.int32),
                     out_shardings=data)()
    loc_dev = dist.put_row_sharded(loc[rows.start:rows.stop], data, n_data)

    def local(pbuf, cur, loff, pk, vb, roff):
        codes, valid = packed_window_codes(pk[0], vb[0], k,
                                           out_dtype=jnp.uint64)
        slot = resolve_slots(codes.reshape(-1),
                             valid.reshape(-1)).astype(jnp.int64)
        pos0 = roff[0] + jnp.arange(slot.shape[0], dtype=jnp.int64)
        all_s = jax.lax.all_gather(slot, DATA_AXIS).reshape(-1)
        all_p = jax.lax.all_gather(pos0, DATA_AXIS).reshape(-1)
        d = jax.lax.axis_index(DATA_AXIS).astype(jnp.int64)
        lo = d * jnp.int64(m)
        sel = (all_s >= lo) & (all_s < lo + jnp.int64(m))
        pb, cu = _scatter_chunk(pbuf[0], cur[0], loff[0], all_s - lo,
                                all_p, sel)
        return pb[None], cu[None]

    step = jax.jit(shard_map(local, mesh=mesh,
                             in_specs=(P(DATA_AXIS),) * 6,
                             out_specs=(P(DATA_AXIS), P(DATA_AXIS))),
                   donate_argnums=(0, 1))

    stride = None
    row = 0
    done = 0
    for batch in blob_chunk_batches(blob, k, chunk, n_data, row_range=rows):
        if stride is None:
            stride = batch.shape[1] - (k - 1)  # == windows per row
        packed, vbits = pack_ascii_chunk(batch)
        roff = ((row + np.arange(n_data, dtype=np.int64))
                * stride)[rows.start:rows.stop]
        positions, cursor = step(positions, cursor, loc_dev,
                                 dist.put_row_sharded(packed, data, n_data),
                                 dist.put_row_sharded(vbits, data, n_data),
                                 dist.put_row_sharded(roff, data, n_data))
        row += n_data
        if on_progress is not None:
            done = min(done + stride * n_data, blob.size)
            on_progress(done)
    # each process materialises only its own slot-range segments; the
    # cross-process concat (segment ranges ascend with the process index)
    # reassembles the identical full positions array on every host
    pos_rows = dist.local_row_shards(positions, mesh)
    local = np.concatenate([pos_rows[d][:seg_len[d]] for d in rows])
    return PositionalIndex(offsets.astype(np.uint64),
                           dist.allgather_concat(local))

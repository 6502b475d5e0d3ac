"""Mesh-parallel positional-index build: slot-range-sharded CSR fill.

The reference parallelises this phase with per-slot atomic write cursors
over threads (lu_compressed_worker, /root/reference/src/hash.cpp:960-1060).
The mesh formulation keeps the deterministic sort-based fill of
aindex_tpu.index.positional and adds two axes of parallelism:

* data: each device extracts windows and resolves slots for its OWN blob
  chunk (batch rows shard over the ``data`` axis);
* index: the CSR positions array is sharded by equal slot ranges — shard d
  owns slots [d*m, (d+1)*m) and the corresponding positions segment.

Pair exchange (round 5): each device pre-buckets its (slot, position)
pairs by destination shard — packed to ONE uint64 per pair (slot in the
high bits, the in-batch position delta in the low 24) — into fixed-capacity
buckets, and a single ``all_to_all`` delivers to every shard exactly the
pairs it owns. Per-batch collective bytes fall from 16*N*B (the r4
all_gather of the full pair stream to every device, SCALING.md's heaviest
row) to 8*slack*B, an ~2N/slack = 8x cut at N=8. MPHF slots are
hash-uniform, so a 2x-mean capacity overflows only on adversarial skew
(e.g. one hub k-mer dominating a chunk); overflow is detected on device,
accumulated into a flag, and the build transparently re-runs with the
always-correct all_gather exchange (also selectable via
``AINDEX_TPU_POSITIONAL_EXCHANGE=allgather|alltoall``).

XLA collectives need static shapes — hence fixed-capacity buckets rather
than a variable split. The scatter itself is the same rank-in-run kernel
as the single-device build (positional._scatter_chunk), and pairs are
re-ordered by (source device, in-chunk offset) before scattering, so the
assembled result stays byte-identical to the single-device build — parity
is tested at 1/2/4/8 devices for both exchanges.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aindex_tpu.parallel.mesh import DATA_AXIS

EXCHANGE_ENV = "AINDEX_TPU_POSITIONAL_EXCHANGE"

#: bucket capacity = ceil(slack * windows / n_data): 2x the uniform mean
_BUCKET_SLACK = 2.0
#: in-batch position deltas are packed into this many low bits
_DELTA_BITS = 24


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
                             chunk: int = 1 << 22, on_progress=None,
                             exchange: str | None = None):
    """Data-parallel, slot-range-sharded positional CSR build.

    ``resolve_slots(codes_u64, valid) -> int slot per window (-1 = absent
    / invalid)`` must be pure JAX — it is traced inside the per-device
    shard (dense13: the code itself; sparse23: the verified cuckoo/MPHF
    probe). ``tf`` is the per-slot occurrence histogram from the counting
    phase (host or device; materialised host-side for the offsets, as the
    single-device builder also does on return).

    ``exchange``: 'alltoall' (default; bucketed packed-pair all_to_all,
    ~8x less collective traffic at N=8) or 'allgather' (full pair stream
    to every device — the always-correct fallback the alltoall path
    auto-retries with on bucket overflow). Env override: EXCHANGE_ENV.
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

    def _resolve_local(pk, vb):
        codes, valid = packed_window_codes(pk[0], vb[0], k,
                                           out_dtype=jnp.uint64)
        return resolve_slots(codes.reshape(-1),
                             valid.reshape(-1)).astype(jnp.int64)

    def local_allgather(pbuf, cur, loff, pk, vb, roff):
        slot = _resolve_local(pk, vb)
        pos0 = roff[0] + jnp.arange(slot.shape[0], dtype=jnp.int64)
        all_s = jax.lax.all_gather(slot, DATA_AXIS).reshape(-1)
        all_p = jax.lax.all_gather(pos0, DATA_AXIS).reshape(-1)
        d = jax.lax.axis_index(DATA_AXIS).astype(jnp.int64)
        lo = d * jnp.int64(m)
        sel = (all_s >= lo) & (all_s < lo + jnp.int64(m))
        pb, cu = _scatter_chunk(pbuf[0], cur[0], loff[0], all_s - lo,
                                all_p, sel)
        return pb[None], cu[None], jnp.zeros((), jnp.int64)

    def local_alltoall(pbuf, cur, loff, pk, vb, roff):
        slot = _resolve_local(pk, vb)
        B = slot.shape[0]
        cap = int(np.ceil(_BUCKET_SLACK * B / n_data)) + 64
        ok = slot >= 0
        # destination shard per pair; dropped pairs route to bucket n_data
        dest = jnp.where(ok, slot // jnp.int64(m), jnp.int64(n_data))
        order = jnp.argsort(dest, stable=True)
        dest_s = dest[order]
        slot_s = slot[order]
        delta_s = order.astype(jnp.uint64)  # in-batch position delta
        start = jnp.searchsorted(dest_s, jnp.arange(n_data + 1,
                                                    dtype=jnp.int64))
        rank = jnp.arange(B, dtype=jnp.int64) - start[dest_s]
        keep = (rank < cap) & (dest_s < n_data)
        overflow = jnp.sum(((rank >= cap) & (dest_s < n_data))
                           .astype(jnp.int64))
        packed = ((slot_s + 1).astype(jnp.uint64)
                  << jnp.uint64(_DELTA_BITS)) | delta_s
        buckets = jnp.zeros((n_data + 1, cap), jnp.uint64)
        buckets = buckets.at[
            jnp.where(keep, dest_s, n_data),
            jnp.where(keep, rank, 0).astype(jnp.int32)].set(
            jnp.where(keep, packed, jnp.uint64(0)))
        # row s of the result = the bucket source s built for me
        recv = jax.lax.all_to_all(buckets[:n_data], DATA_AXIS, 0, 0,
                                  tiled=True)
        roff_g = jax.lax.all_gather(roff[0], DATA_AXIS)  # [n_data] scalars
        slot_r = (recv >> jnp.uint64(_DELTA_BITS)).astype(jnp.int64) - 1
        delta_r = (recv & jnp.uint64((1 << _DELTA_BITS) - 1)).astype(jnp.int64)
        pos_r = roff_g[:, None] + delta_r
        sel = slot_r >= 0
        d = jax.lax.axis_index(DATA_AXIS).astype(jnp.int64)
        lo = d * jnp.int64(m)
        # flatten in (source, in-batch) order == the global stream order of
        # the all_gather path -> byte-identical CSR
        pb, cu = _scatter_chunk(pbuf[0], cur[0], loff[0],
                                (slot_r - lo).reshape(-1),
                                pos_r.reshape(-1), sel.reshape(-1))
        return pb[None], cu[None], jax.lax.psum(overflow, DATA_AXIS)

    def make_step(fn):
        return jax.jit(shard_map(fn, mesh=mesh,
                                 in_specs=(P(DATA_AXIS),) * 6,
                                 out_specs=(P(DATA_AXIS), P(DATA_AXIS),
                                            P())),
                       donate_argnums=(0, 1))

    mode = exchange or os.environ.get(EXCHANGE_ENV, "alltoall")
    if mode not in ("alltoall", "allgather"):
        raise ValueError(f"unknown positional exchange {mode!r}")

    def run(step_mode):
        nonlocal positions, cursor
        step = make_step(local_alltoall if step_mode == "alltoall"
                         else local_allgather)
        oflow = jnp.zeros((), jnp.int64)
        stride = None
        row = 0
        done = 0
        for batch in blob_chunk_batches(blob, k, chunk, n_data,
                                        row_range=rows):
            if stride is None:
                stride = batch.shape[1] - (k - 1)  # == windows per row
                if step_mode == "alltoall" and stride >= (1 << _DELTA_BITS):
                    return None  # delta field too narrow for this chunk
            packed, vbits = pack_ascii_chunk(batch)
            roff = ((row + np.arange(n_data, dtype=np.int64))
                    * stride)[rows.start:rows.stop]
            positions, cursor, of = step(
                positions, cursor, loc_dev,
                dist.put_row_sharded(packed, data, n_data),
                dist.put_row_sharded(vbits, data, n_data),
                dist.put_row_sharded(roff, data, n_data))
            oflow = oflow + of
            row += n_data
            if on_progress is not None:
                done = min(done + stride * n_data, blob.size)
                on_progress(done)
        return int(oflow)

    out = run(mode)
    if mode == "alltoall" and (out is None or out > 0):
        # bucket overflow (adversarially skewed slots) or oversized chunk:
        # redo with the always-correct full-gather exchange
        import logging
        logging.getLogger(__name__).info(
            "positional alltoall exchange fell back to allgather (%s)",
            "chunk too large" if out is None else f"{out} overflow pairs")
        positions = jax.jit(lambda: jnp.zeros((n_data, L), jnp.uint64),
                            out_shardings=data)()
        cursor = jax.jit(lambda: jnp.zeros((n_data, m), jnp.int32),
                         out_shardings=data)()
        run("allgather")
    # each process materialises only its own slot-range segments; the
    # cross-process concat (segment ranges ascend with the process index)
    # reassembles the identical full positions array on every host
    pos_rows = dist.local_row_shards(positions, mesh)
    local = np.concatenate([pos_rows[d][:seg_len[d]] for d in rows])
    return PositionalIndex(offsets.astype(np.uint64),
                           dist.allgather_concat(local))

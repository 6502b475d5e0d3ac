"""Multi-device sparse k-mer spectrum: key-range-sharded device reduction.

The reference merges per-thread ``unordered_map`` spectra under a lock
(/root/reference/src/count_kmers.cpp:47-64,334-341). The mesh-native
formulation (SURVEY.md §2.7 "thread-local maps + merge" -> keyed exchange):

  1. each device reduces its read-chunk shard to a local sorted unique
     (key, count) spectrum (sort + segment-reduce, kernels/spectrum.py);
  2. one ``all_gather`` over the ``data`` axis exchanges the *already
     deduplicated* partials (far smaller than the raw window stream);
  3. each device keeps only the keys in its range of the 2k-bit code space
     — a static, uniform partition — and segment-reduces the weighted
     pairs into its shard of the global spectrum.

The ranges are disjoint and ascending with the device index, so the global
spectrum is the in-order concatenation of the shard spectra: globally
sorted, deterministic, and never materialised on one device. all_gather of
padded fixed-size partials replaces a variable-split all-to-all (XLA
collectives need static shapes); with uniformly-hashed canonical codes the
per-range load is balanced.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aindex_tpu.kernels.spectrum import (SENTINEL, sorted_spectrum,
                                         sorted_spectrum_weighted)
from aindex_tpu.parallel.mesh import DATA_AXIS


@functools.partial(jax.jit, static_argnames=("mesh", "k"))
def spectrum23_sharded(packed: jax.Array, validbits: jax.Array, *, mesh: Mesh,
                       k: int):
    """Global canonical spectrum of a packed [rows, W]+[rows, 2W] ingest
    batch (codec.pack_ascii_chunk), key-sharded.

    Returns (keys[n_data, cap], counts[n_data, cap], n_unique[n_data]):
    shard d holds the global spectrum of key range
    [d * range, (d+1) * range) in its first n_unique[d] entries.
    """
    from aindex_tpu.kernels.encode import (canonical_code64,
                                           unpack_base_codes, window_codes)

    n_data = mesh.shape[DATA_AXIS]
    range_size = -(-(4 ** k) // n_data)

    def local(shard_p, shard_v):
        base = unpack_base_codes(shard_p, shard_v)
        codes, valid = window_codes(base, k, out_dtype=jnp.uint64)
        canon = canonical_code64(codes, k)
        keyed = jnp.where(valid, canon, SENTINEL).reshape(-1)
        keys_l, counts_l, _ = sorted_spectrum(keyed)
        all_k = jax.lax.all_gather(keys_l, DATA_AXIS)    # [n_data, W]
        all_c = jax.lax.all_gather(counts_l, DATA_AXIS)
        d = jax.lax.axis_index(DATA_AXIS)
        lo = jnp.uint64(range_size) * d.astype(jnp.uint64)
        hi = lo + jnp.uint64(range_size)
        mine = (all_k >= lo) & (all_k < hi)              # SENTINEL never in range
        keys_o, counts_o, n_u = sorted_spectrum_weighted(
            jnp.where(mine, all_k, SENTINEL).reshape(-1),
            jnp.where(mine, all_c.astype(jnp.uint64),
                      jnp.uint64(0)).reshape(-1))
        return keys_o[None], counts_o[None], n_u[None]

    fn = shard_map(local, mesh=mesh, in_specs=(P(DATA_AXIS), P(DATA_AXIS)),
                   out_specs=(P(DATA_AXIS), P(DATA_AXIS), P(DATA_AXIS)))
    return fn(packed, validbits)


def count_canonical_kmers_sharded(blob: np.ndarray, mesh: Mesh, k: int,
                                  chunk: int = 1 << 20, on_progress=None
                                  ) -> tuple[np.ndarray, np.ndarray]:
    """(unique canonical codes, counts) over the blob, reduced on the mesh.

    Streams [n_data, chunk] batches; per batch the cross-device dedup runs
    on device (one all_gather), so the host only merges the per-range
    partial spectra across batches — each a fraction of the key space.

    Multi-host (jax.process_count() > 1, see parallel.distributed): each
    host packs and feeds ONLY its own mesh rows of every batch (its input
    shard — with a memmapped blob, other hosts' bytes are never read),
    pulls back only its own key-range shards, and one variable-size
    process allgather at the end concatenates the per-host range spectra
    into the identical globally-sorted spectrum on every host.
    """
    from aindex_tpu.core.codec import pack_ascii_chunk
    from aindex_tpu.core.reads import blob_chunk_batches
    from aindex_tpu.kernels.spectrum import merge_spectra
    from aindex_tpu.parallel import distributed as dist

    n_data = mesh.shape[DATA_AXIS]
    data_spec = NamedSharding(mesh, P(DATA_AXIS))
    rows = dist.local_data_rows(mesh) if dist.is_multiprocess() \
        else range(n_data)
    shard_parts: dict[int, list[tuple[np.ndarray, np.ndarray]]] = \
        {d: [] for d in rows}
    done, step = 0, (chunk - (k - 1)) * n_data
    for batch in blob_chunk_batches(blob, k, chunk, n_data, row_range=rows):
        packed, vbits = pack_ascii_chunk(batch)
        keys, counts, n_u = spectrum23_sharded(
            dist.put_row_sharded(packed, data_spec, n_data),
            dist.put_row_sharded(vbits, data_spec, n_data), mesh=mesh, k=k)
        key_rows = dist.local_row_shards(keys, mesh)
        count_rows = dist.local_row_shards(counts, mesh)
        nu_rows = dist.local_row_shards(n_u, mesh)
        for d in rows:
            n = int(nu_rows[d])
            if n:
                shard_parts[d].append((key_rows[d][:n], count_rows[d][:n]))
        done = min(done + step, blob.size)
        if on_progress is not None:
            on_progress(done)
    merged = [merge_spectra(shard_parts[d]) for d in rows]
    local_keys = np.concatenate([m[0] for m in merged]) if merged else \
        np.zeros(0, np.uint64)
    local_counts = np.concatenate([m[1] for m in merged]) if merged else \
        np.zeros(0, np.uint64)
    # key ranges ascend with the data row, and rows ascend with the
    # process index — the cross-process concat is already globally sorted
    return (dist.allgather_concat(local_keys),
            dist.allgather_concat(local_counts))

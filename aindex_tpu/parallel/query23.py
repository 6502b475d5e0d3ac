"""Index-sharded sparse 23-mer queries over a device mesh.

The sparse table's per-slot arrays (tf, checker) are sharded by slot range
across the ``index`` axis — the 1-D tensor-parallel layout called for by the
north star (BASELINE.md: "23-mer MPHF + frequency arrays sharded across
hosts"). The MPHF itself (g-values + node->slot map) is replicated: it is the
routing structure every device needs to compute slot ids locally. Each device
then answers the slice of queries whose slot falls in its shard and a single
``psum`` over ``index`` merges the masked partials — query routing without
any all-to-all of per-key state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aindex_tpu.kernels.lookup import mphf_lookup
from aindex_tpu.parallel.mesh import INDEX_AXIS


def shard_slot_arrays(mesh: Mesh, tf: np.ndarray, checker: np.ndarray
                      ) -> tuple[jax.Array, jax.Array, int]:
    """Place tf/checker on the mesh sharded by slot range (padded to divide).

    Returns (tf_sharded, checker_sharded, padded_n).
    """
    n_index = mesh.shape[INDEX_AXIS]
    n = len(tf)
    padded = -(-max(n, 1) // n_index) * n_index
    tf_p = np.zeros(padded, dtype=tf.dtype)
    tf_p[:n] = tf
    # pad checker with an impossible key (all ones) so padded slots never match
    ck_p = np.full(padded, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    ck_p[:n] = checker
    spec = NamedSharding(mesh, P(INDEX_AXIS))
    return (jax.device_put(tf_p, spec), jax.device_put(ck_p, spec), padded)


@functools.partial(jax.jit, static_argnames=("mesh",))
def query23_sharded(g_packed: jax.Array, slots: jax.Array,
                    tf_sharded: jax.Array, checker_sharded: jax.Array,
                    seed: jax.Array, domain: jax.Array,
                    canon: jax.Array, valid: jax.Array, *, mesh: Mesh
                    ) -> jax.Array:
    """tf per canonical query key against the slot-sharded table.

    Queries are replicated; each device resolves slot ids with the replicated
    MPHF, serves the ones in its slot range from its local tf/checker shard,
    and the masked partials merge with one psum (SURVEY.md §2.7).
    """
    n_index = mesh.shape[INDEX_AXIS]

    def local(tf_l, ck_l, canon_l, valid_l):
        shard = jax.lax.axis_index(INDEX_AXIS)
        shard_size = tf_l.shape[0]
        lo = (shard * shard_size).astype(jnp.int64)
        slot = mphf_lookup(g_packed, slots, canon_l, seed, domain).astype(jnp.int64)
        local_ix = slot - lo
        in_range = (local_ix >= 0) & (local_ix < shard_size)
        safe_ix = jnp.where(in_range, local_ix, 0).astype(jnp.int32)
        ok = in_range & (ck_l[safe_ix] == canon_l) & valid_l
        vals = jnp.where(ok, tf_l[safe_ix], jnp.zeros((), tf_l.dtype))
        return jax.lax.psum(vals, INDEX_AXIS)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(INDEX_AXIS), P(INDEX_AXIS), P(), P()),
        out_specs=P(),
    )
    return fn(tf_sharded, checker_sharded, canon, valid)


class ShardedSparse23:
    """Mesh-resident view of a Sparse23Index with slot-sharded tf/checker."""

    def __init__(self, index, mesh: Mesh):
        self.k = index.k
        self.n = index.n
        self.mesh = mesh
        self.g_packed = jax.device_put(index.mphf.g_packed,
                                       NamedSharding(mesh, P()))
        self.slots = jax.device_put(index.mphf.slots, NamedSharding(mesh, P()))
        self.seed = jnp.uint64(index.mphf.seed)
        self.domain = jnp.uint64(index.mphf.domain)
        self.tf_sharded, self.checker_sharded, self.padded_n = \
            shard_slot_arrays(mesh, index.tf_host, index.checker_host)

    def get_tf_values(self, kmers: list[str]) -> np.ndarray:
        from aindex_tpu.core import codec
        codes, valid = codec.encode_kmers(kmers, self.k)
        canon = codec.canonical_code(codes, self.k)
        out = query23_sharded(
            self.g_packed, self.slots, self.tf_sharded, self.checker_sharded,
            self.seed, self.domain, jnp.asarray(canon), jnp.asarray(valid),
            mesh=self.mesh)
        return np.asarray(out)

    def get_tf_values_codes(self, codes, valid=None) -> jax.Array:
        """Codes-in twin of Sparse23Index.get_tf_values_codes against the
        slot-sharded table: device array in -> device uint32 out, served
        by every device's shard with one psum merge."""
        from aindex_tpu.kernels.encode import canonical_code64
        codes = jnp.asarray(codes).astype(jnp.uint64)
        if valid is None:
            valid = jnp.ones(codes.shape, dtype=bool)
        canon = canonical_code64(codes, self.k)
        out = query23_sharded(
            self.g_packed, self.slots, self.tf_sharded, self.checker_sharded,
            self.seed, self.domain, canon, jnp.asarray(valid),
            mesh=self.mesh)
        return out.astype(jnp.uint32)

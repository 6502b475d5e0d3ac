"""Index-sharded sparse 23-mer queries over a device mesh.

The 1-D tensor-parallel layout the north star calls for (BASELINE.md:
"23-mer MPHF + frequency arrays sharded across hosts"), round-5 form:
EVERYTHING that scales with key count is sharded over the ``index`` axis —

* ``slots`` (owner node -> slot id, the big MPHF component at ~13 B/key)
  shards by NODE range;
* ``tf`` and ``checker`` (12 B/key) shard by SLOT range;
* only the 2-bit g-value words (~1 bit/key) and the query batch replicate —

so per-device resident bytes actually FALL as the mesh grows (round 4
replicated the whole node->slot map on every device). A query is: every
device computes owner nodes locally from the replicated g-values, the
device owning the node range contributes the slot id (one psum), the
device owning that slot range contributes verified tf + found (second
psum) — query routing with two scalar-per-key collectives, no all-to-all.

The full query surface of the single-device engine is served sharded:
tf (ASCII and codes-in), both-directions, De Bruijn continuation
(next/prev + CONT records via the SharedQueryOps mixin), coverage, pfid /
raw-hash resolution for position lookups.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from aindex_tpu.index.sparse23 import SharedQueryOps
from aindex_tpu.kernels.lookup import mphf_owner_node
from aindex_tpu.parallel.mesh import INDEX_AXIS


def _shard_1d(mesh: Mesh, arr: np.ndarray, pad_value) -> tuple[jax.Array, int]:
    """Place a host array on the mesh sharded over INDEX_AXIS (padded to
    divide). Returns (sharded array, padded length)."""
    n_index = mesh.shape[INDEX_AXIS]
    n = len(arr)
    padded = -(-max(n, 1) // n_index) * n_index
    buf = np.full(padded, pad_value, dtype=arr.dtype)
    buf[:n] = arr
    return jax.device_put(buf, NamedSharding(mesh, P(INDEX_AXIS))), padded


def shard_slot_arrays(mesh: Mesh, tf: np.ndarray, checker: np.ndarray
                      ) -> tuple[jax.Array, jax.Array, int]:
    """Slot-range-sharded tf/checker placement (r4 API, kept for the
    positional mesh build). Padded checker slots hold an impossible key."""
    tf_s, padded = _shard_1d(mesh, np.asarray(tf, dtype=np.uint32), 0)
    ck_s, _ = _shard_1d(mesh, np.asarray(checker, dtype=np.uint64),
                        np.uint64(0xFFFFFFFFFFFFFFFF))
    return tf_s, ck_s, padded


@functools.partial(jax.jit, static_argnames=("mesh",))
def resolve23_sharded(g_packed: jax.Array, slots_sharded: jax.Array,
                      tf_sharded: jax.Array, checker_sharded: jax.Array,
                      seed: jax.Array, domain: jax.Array,
                      canon: jax.Array, valid: jax.Array, *, mesh: Mesh
                      ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(tf, raw_slot, found) per canonical key against the fully-sharded
    table. ``raw_slot`` is the unverified MPHF id (get_hash_value
    semantics); ``found`` gates tf and verified-slot consumers."""

    def local(slots_l, tf_l, ck_l, canon_l, valid_l):
        shard = jax.lax.axis_index(INDEX_AXIS)
        node = mphf_owner_node(g_packed, canon_l, seed, domain)
        nsz = slots_l.shape[0]
        nloc = node - (shard * nsz).astype(node.dtype)
        nin = (nloc >= 0) & (nloc < nsz)
        slot_part = jnp.where(nin, slots_l[jnp.where(nin, nloc, 0)], 0)
        slot = jax.lax.psum(slot_part, INDEX_AXIS)
        ssz = tf_l.shape[0]
        sloc = slot.astype(jnp.int64) - shard.astype(jnp.int64) * ssz
        sin = (sloc >= 0) & (sloc < ssz)
        safe = jnp.where(sin, sloc, 0).astype(jnp.int32)
        ok_part = sin & (ck_l[safe] == canon_l) & valid_l
        tf_part = jnp.where(ok_part, tf_l[safe], jnp.zeros((), tf_l.dtype))
        tf = jax.lax.psum(tf_part, INDEX_AXIS)
        found = jax.lax.psum(ok_part.astype(jnp.int32), INDEX_AXIS) > 0
        return tf, slot, found

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(INDEX_AXIS), P(INDEX_AXIS), P(INDEX_AXIS), P(), P()),
        out_specs=(P(), P(), P()),
    )
    return fn(slots_sharded, tf_sharded, checker_sharded, canon, valid)


class ShardedSparse23(SharedQueryOps):
    """Mesh-resident engine over a Sparse23Index with node-sharded MPHF
    slots and slot-sharded tf/checker (canonical-keyed indexes only; the
    facade keeps reference-keyed indexes on the single-device engine).

    Serves the whole query surface; mixin methods (coverage, De Bruijn)
    come from sparse23.SharedQueryOps via the hooks below.
    """

    def __init__(self, index, mesh: Mesh):
        if not index.canonical_keys or not hasattr(index.mphf, "g_packed"):
            raise ValueError("sharded engine requires a canonical-keyed "
                             "native-MPHF index")
        self.k = index.k
        self.n = index.n
        self.mesh = mesh
        self.g_packed = jax.device_put(np.asarray(index.mphf.g_packed),
                                       NamedSharding(mesh, P()))
        self.seed = jnp.uint64(index.mphf.seed)
        self.domain = jnp.uint64(index.mphf.domain)
        self.slots_sharded, self.padded_nodes = _shard_1d(
            mesh, np.asarray(index.mphf.slots, dtype=np.int32), 0)
        self.tf_sharded, self.checker_sharded, self.padded_n = \
            shard_slot_arrays(mesh, index.tf_host, index.checker_host)

    @property
    def per_device_bytes(self) -> int:
        """HBM bytes resident per device: sharded arrays divided across
        the mesh plus the replicated g-values."""
        n_index = self.mesh.shape[INDEX_AXIS]
        sharded = (self.slots_sharded.dtype.itemsize * self.padded_nodes
                   + (self.tf_sharded.dtype.itemsize
                      + self.checker_sharded.dtype.itemsize) * self.padded_n)
        return sharded // n_index + self.g_packed.nbytes

    # -- core resolution ---------------------------------------------------

    def _resolve_codes(self, codes, valid=None):
        """(tf, slot, strand) for LITERAL codes, all on device; slot -1
        when absent; strand 0/1/2 = absent/forward/revcomp."""
        from aindex_tpu.kernels.encode import revcomp_code64
        codes_j = jnp.asarray(codes).astype(jnp.uint64)
        rc = revcomp_code64(codes_j, self.k)
        canon = jnp.minimum(codes_j, rc)
        valid_j = jnp.ones(codes_j.shape, bool) if valid is None \
            else jnp.asarray(valid)
        tf, slot, found = resolve23_sharded(
            self.g_packed, self.slots_sharded, self.tf_sharded,
            self.checker_sharded, self.seed, self.domain, canon, valid_j,
            mesh=self.mesh)
        strand = jnp.where(found,
                           jnp.where(codes_j <= rc, 1, 2), 0).astype(jnp.int32)
        slot = jnp.where(found, slot, -1)
        return tf.astype(jnp.uint32), slot.astype(jnp.int32), strand

    def _resolve_tf_device(self, codes, valid):
        """SharedQueryOps hook: tf per literal code (device)."""
        tf, _, _ = self._resolve_codes(codes, valid)
        return tf

    def _encode(self, kmers: list[str]):
        from aindex_tpu.core import codec
        return codec.encode_kmers(kmers, self.k)

    def _ext_tf(self, ext_codes: np.ndarray, cutoff: int) -> np.ndarray:
        flat = ext_codes.reshape(-1)
        tf = np.asarray(self._resolve_tf_device(flat, None))
        tf = tf.reshape(ext_codes.shape)
        if cutoff > 0:
            tf = np.where(tf <= cutoff, 0, tf)
        return tf

    # -- public surface (Sparse23Index signatures) -------------------------

    def get_tf_values(self, kmers: list[str]) -> np.ndarray:
        codes, valid = self._encode(kmers)
        tf, _, _ = self._resolve_codes(codes, valid)
        return np.asarray(tf)

    def get_tf_values_codes(self, codes, valid=None) -> jax.Array:
        """Codes-in twin of Sparse23Index.get_tf_values_codes against the
        sharded tables: device array in -> device uint32 out."""
        return self._resolve_tf_device(jnp.asarray(codes), valid)

    def get_tf_both_directions(self, kmers: list[str]
                               ) -> tuple[np.ndarray, np.ndarray]:
        """(fwd tf, rc tf) — canonical-keyed indexes resolve both strands
        to the same verified tf (see Sparse23Index.get_tf_both_directions)."""
        tf = self.get_tf_values(kmers)
        return tf, tf.copy()

    def get_pfids(self, kmers: list[str]) -> np.ndarray:
        """Verified slot id per k-mer; n when absent."""
        codes, valid = self._encode(kmers)
        _, slot, _ = self._resolve_codes(codes, valid)
        slot = np.asarray(slot).astype(np.int64)
        return np.where(slot < 0, self.n, slot)

    def get_hash_values(self, kmers: list[str]) -> np.ndarray:
        """Raw (unverified) MPHF ids of the literal k-mer strings."""
        from aindex_tpu.kernels.encode import revcomp_code64  # noqa: F401
        codes, _ = self._encode(kmers)
        codes_j = jnp.asarray(codes).astype(jnp.uint64)
        valid_j = jnp.ones(codes_j.shape, bool)
        _, slot, _found = resolve23_sharded(
            self.g_packed, self.slots_sharded, self.tf_sharded,
            self.checker_sharded, self.seed, self.domain, codes_j, valid_j,
            mesh=self.mesh)
        return np.asarray(slot).astype(np.int64)

    def get_strands(self, kmers: list[str]) -> np.ndarray:
        codes, valid = self._encode(kmers)
        _, _, strand = self._resolve_codes(codes, valid)
        return np.asarray(strand)

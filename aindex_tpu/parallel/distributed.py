"""Multi-host initialisation and global mesh construction.

The reference is strictly single-node (SURVEY.md §2.7); scaling beyond one
host is new capability in the TPU rebuild. The model:

* every host runs the same program (SPMD) and calls :func:`initialize`
  once before any JAX computation;
* :func:`global_mesh` builds the (data, index) mesh over ALL devices in the
  job — ``data`` parallelism rides DCN across hosts (reads are independent,
  so host-local input pipelines shard naturally by host), ``index``
  sharding stays intra-slice on ICI where the psum merge is cheap;
* per-host input sharding: :func:`host_read_slice` tells each host which
  slice of an input file list it owns.

Single-process runs (tests, one chip) work unchanged — ``initialize`` is a
no-op when no cluster environment is detected.
"""

from __future__ import annotations

import logging
import os

import jax

from aindex_tpu.parallel.mesh import make_mesh

logger = logging.getLogger(__name__)


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host job (jax.distributed) if one is configured.

    With no arguments, relies on the environment (TPU pod metadata or
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). A no-op
    for single-process runs.
    """
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    if coordinator_address is None and num_processes is None:
        in_pod = bool(os.environ.get("TPU_WORKER_HOSTNAMES", "").count(",")) or \
            os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        if not in_pod:
            logger.debug("single-process run; skipping jax.distributed")
            return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    logger.info("joined distributed job: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def global_mesh(n_index: int = 1):
    """(data, index) mesh over every device in the job.

    ``n_index`` devices shard the sparse table's slot dimension (keep these
    within one host/slice so the query psum rides ICI); the rest carry data
    parallelism. Device order follows ``jax.devices()``, which groups by
    process — so consecutive ``data`` rows map to whole hosts and read
    streaming stays host-local.
    """
    n_devices = jax.device_count()
    if n_devices % n_index:
        raise ValueError(f"n_index={n_index} must divide device count {n_devices}")
    return make_mesh(n_data=n_devices // n_index, n_index=n_index,
                     devices=jax.devices())


def host_read_slice(n_items: int) -> slice:
    """The slice of a length-``n_items`` input list this host should read —
    contiguous, balanced host-level data sharding for input pipelines."""
    p, np_ = jax.process_index(), jax.process_count()
    per = -(-n_items // np_)
    return slice(p * per, min((p + 1) * per, n_items))

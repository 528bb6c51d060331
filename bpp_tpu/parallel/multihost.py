"""Multi-host (multi-process) execution over a global device mesh.

The reference has NO multi-machine story — its parallelism tops out at
one host's pthreads (src/threads.c).  This module is the scale-out
layer the TPU build adds: N processes (one per TPU host, or N CPU
processes for testing) form one JAX cluster, the locus axis is sharded
over the GLOBAL device mesh, and the jitted MCMC step runs SPMD with
XLA inserting the cross-host collectives (the lnacceptance / logl-sum
reductions that threads.c:525-594 does on the master thread).

Data feeding: every process parses the ctl + alignment (input parsing
is cheap and deterministic), builds the same global host-side arrays,
and contributes only its addressable shards via
``jax.make_array_from_process_local_data`` — no host ever materializes
device arrays outside its shard of the locus axis.

Usage (one command per host):

  bpp-tpu --cfile run.ctl \
      --multihost <coordinator_ip:port>,<num_processes>,<process_id>

or with the standard cluster env vars (JAX_COORDINATOR_ADDRESS,
JAX_NUM_PROCESSES, JAX_PROCESS_ID) just ``--multihost auto``.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import LOCI_AXIS, locus_sharding, replicated


@dataclasses.dataclass(frozen=True)
class MultihostSpec:
    coordinator: str | None
    num_processes: int | None
    process_id: int | None

    @classmethod
    def parse(cls, arg: str) -> "MultihostSpec":
        """Parse '--multihost host:port,N,i' (or 'auto' for env vars)."""
        if arg.strip().lower() == "auto":
            return cls(None, None, None)
        parts = arg.split(",")
        if len(parts) != 3:
            raise ValueError(
                "--multihost expects 'coordinator:port,num_processes,"
                "process_id' or 'auto'")
        return cls(parts[0].strip(), int(parts[1]), int(parts[2]))


def init_multihost(spec: MultihostSpec) -> Mesh:
    """jax.distributed.initialize + the global 1-D locus mesh.

    Must run before any other JAX call in the process.  Returns the
    mesh over ALL devices in the cluster (each process contributes its
    local devices).
    """
    jax.distributed.initialize(
        coordinator_address=spec.coordinator,
        num_processes=spec.num_processes,
        process_id=spec.process_id,
    )
    return global_mesh()


def global_mesh() -> Mesh:
    return Mesh(np.asarray(jax.devices()), (LOCI_AXIS,))


def shard_global_pytree(tree, mesh: Mesh, n_loci: int):
    """Multi-process version of mesh.shard_pytree_by_locus.

    Every process holds the full host-side (numpy) pytree; arrays with
    leading dim ``n_loci`` become global jax.Arrays sharded over the
    mesh with each process contributing only its local rows; everything
    else is replicated.
    """
    shard = locus_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        if hasattr(x, "shape") and getattr(x, "ndim", 0) >= 1 \
                and x.shape[0] == n_loci:
            local = _local_rows(np.asarray(x), shard)
            return jax.make_array_from_process_local_data(shard, local,
                                                          x.shape)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


def _local_rows(x: np.ndarray, sharding: NamedSharding) -> np.ndarray:
    """The contiguous row-block of ``x`` owned by this process."""
    n = x.shape[0]
    nproc = jax.process_count()
    pid = jax.process_index()
    # the 1-D mesh enumerates devices process-major (jax.devices() is
    # sorted by process), so each process owns one contiguous block
    per = -(-n // nproc)
    return x[pid * per: min((pid + 1) * per, n)]


def pad_loci_for_mesh(n_loci: int, mesh: Mesh) -> int:
    """Smallest multiple of the mesh size >= n_loci (pad loci with
    masked dummies so the shard split is even; locus_mask already
    zeroes their contributions)."""
    n_dev = mesh.devices.size
    return -(-n_loci // n_dev) * n_dev

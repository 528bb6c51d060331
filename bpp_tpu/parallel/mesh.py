"""Locus sharding over a device mesh.

TPU-native replacement for the reference's pthread locus partitioning
(``src/threads.c``: static per-thread locus ranges, zigzag balancing,
condvar fork-join).  Here the locus axis of every ``[L, ...]`` array is
sharded over a 1-D ``jax.sharding.Mesh``; species-tree state and step
sizes are replicated.  Cross-locus reductions inside the jitted step
(the lnacceptance/logl sums the reference reduces on the master thread,
``threads.c:525-594``) become XLA collectives automatically under jit.

Multi-host: the same shardings extend over a multi-host mesh via
``jax.distributed.initialize`` — each host feeds its local shard of the
locus axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

LOCI_AXIS = "loci"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (LOCI_AXIS,))


def locus_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(LOCI_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pytree_by_locus(tree, mesh: Mesh, n_loci: int):
    """Place arrays: leading-dim == n_loci -> sharded, else replicated."""
    shard = locus_sharding(mesh)
    rep = replicated(mesh)

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == n_loci:
            return jax.device_put(x, shard)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)

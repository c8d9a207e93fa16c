"""Device mesh construction.

Reference counterpart: none — the reference is single-GPU with no NCCL/MPI
(SURVEY.md §2 "Distributed communication backend").  The TPU rebuild scales by
spatial domain decomposition over the ICI mesh (BASELINE.json north_star:
"shards the spatial grid across the ICI mesh with halo exchange of ghost
particles via jax.lax.ppermute").

A 1D mesh along the simulation x axis suffices: halo traffic rides
nearest-neighbor ICI links, and each device's x slab keeps the Pallas
kernels' 128-lane tiling intact.  Multi-host meshes come for free through
jax.distributed + the same Mesh API (DCN between hosts, ICI within).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "x"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the first n available devices (default: all)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    import numpy as np
    return Mesh(np.asarray(devices), (AXIS,))


def shard_leading(mesh: Mesh):
    """Sharding that splits the leading (device) axis of a stacked array."""
    return NamedSharding(mesh, P(AXIS))

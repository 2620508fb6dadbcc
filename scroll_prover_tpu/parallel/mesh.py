"""Device-mesh helpers for the proving engine.

One flat mesh axis ("shards") is enough for this domain: the parallel axes of
a SNARK prover are data-parallel polynomials/points, not model dimensions, so
every collective pattern we need (butterfly all-to-all for NTT, bucket psum
for MSM, independent chunk proofs) rides a single axis whose physical layout
XLA maps onto the ICI torus.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

SHARD_AXIS = "shards"


def make_mesh(n_devices: int | None = None, axis: str = SHARD_AXIS) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_axis(mesh: Mesh, ndim: int, dim: int = 0) -> NamedSharding:
    """NamedSharding that splits array dimension `dim` across the mesh axis."""
    spec = [None] * ndim
    spec[dim] = mesh.axis_names[0]
    return NamedSharding(mesh, P(*spec))

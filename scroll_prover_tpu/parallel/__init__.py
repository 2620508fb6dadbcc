"""Multi-chip parallelism: device meshes, sharded NTT/MSM over ICI collectives.

The reference's only parallelism is shared-memory rayon plus an optional CUDA
source override (SURVEY.md section 2.2 "Parallelism inventory"); it has no
multi-node story. This package is the TPU-native replacement: jax.sharding
meshes + shard_map with XLA collectives (all_to_all / psum) over ICI.
"""
from .mesh import make_mesh, shard_axis  # noqa: F401

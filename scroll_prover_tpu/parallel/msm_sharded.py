"""Multi-chip MSM: points sharded across the mesh, partials reduced over ICI.

Pippenger parallelizes trivially over points: each shard computes a full
windowed MSM over its point slice, then the per-shard projective results are
combined with a log-depth all-reduce of point additions (a psum whose "+"
is the complete group law — implemented with an all_gather + tree reduce,
since XLA's psum only sums ring elements).

This is the TPU-native replacement for the reference's rayon-parallel CPU
Pippenger (SURVEY.md section 2.2 "Parallelism inventory": MSM bucket-sum
reduction over ICI collectives is the designed scale-out axis).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from ..fields.limbs import N_LIMBS
from ..ops import ec, msm as msm_mod
from .mesh import SHARD_AXIS


def msm_sharded(mesh, points_affine_mont: jnp.ndarray, scalar_limbs: jnp.ndarray) -> ec.PointP:
    """points (n, 2, L) Montgomery affine; scalars (n, L) standard form.
    n must be divisible by the mesh size. Returns a replicated PointP."""
    n = points_affine_mont.shape[0]
    d = mesh.devices.size
    assert n % d == 0, "points must split evenly across shards"
    axis = SHARD_AXIS

    pts = jax.device_put(points_affine_mont, NamedSharding(mesh, P(axis, None, None)))
    scs = jax.device_put(scalar_limbs, NamedSharding(mesh, P(axis, None)))

    def local(p, s):
        # padded to canonical sizes so every mesh width shares one compile
        part = msm_mod.msm_padded(p, s)
        stacked = ec.PointP(part.x[None], part.y[None], part.z[None])
        # gather all shard partials, tree-reduce with the complete group law
        allp = ec.PointP(
            jax.lax.all_gather(stacked.x, axis, axis=0, tiled=True),
            jax.lax.all_gather(stacked.y, axis, axis=0, tiled=True),
            jax.lax.all_gather(stacked.z, axis, axis=0, tiled=True),
        )
        total = ec.add_reduce(allp)
        return total.x[None], total.y[None], total.z[None]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None)),
        out_specs=(P(axis, None), P(axis, None), P(axis, None)),
        check_vma=False,
    )
    x, y, z = jax.jit(f)(pts, scs)
    # every shard computed the same total; take shard 0's copy
    return ec.PointP(x[0], y[0], z[0])


def msm_tile_sharded(mesh, points_affine_mont: jnp.ndarray,
                     scalar_limbs: jnp.ndarray, c: int | None = None):
    """Bucket-kernel MSM sharded over the mesh (VERDICT round-3 item 7:
    the multi-chip path on the FAST kernel, not the scan engine).

    Points/scalars split across devices on the point axis; every device
    accumulates its slice's (W, B) bucket table with the v2 Pallas
    pipeline (ops/msm_tile), the tiny per-shard tables gather, and the
    host folds the shard-sum with the same projective fold as the
    single-chip path. EC addition is exact, so the result is bit-equal to
    single-chip regardless of mesh width. TPU-only (the Pallas kernels
    have no CPU lowering) — CPU meshes use msm_sharded above.

    Returns a host affine point or None."""
    from ..ops import msm_tile as mt

    c = mt.MSM_C if c is None else c
    W, B = mt._wb(c)
    d = mesh.devices.size
    axis = SHARD_AXIS
    n = points_affine_mont.shape[0]
    lane = mt.SUB_T * 128
    chunk = d * lane
    npad = (-n) % chunk
    if npad:
        pad_pt = jnp.broadcast_to(
            points_affine_mont[:1], (npad,) + points_affine_mont.shape[1:]
        )
        points_affine_mont = jnp.concatenate([points_affine_mont, pad_pt])
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.zeros((npad, scalar_limbs.shape[1]), jnp.uint32)]
        )
        n += npad

    pts = jax.device_put(
        points_affine_mont, NamedSharding(mesh, P(axis, None, None))
    )
    scs = jax.device_put(scalar_limbs, NamedSharding(mesh, P(axis, None)))

    def local(p, s):
        px, py = mt._msm_prep_points(p)
        digs, signs = mt._msm_prep_digits(s, c)
        tbl = mt._accum_v2(px, py, digs, signs, B)
        red = mt._lane_reduce_v2(tbl)  # (W, B, 3, L)
        return red[None]

    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None)),
        out_specs=P(axis, None, None, None, None),
        check_vma=False,
    )
    tbls = np.asarray(jax.jit(f)(pts, scs))  # (d, W, B, 3, L)
    return mt._host_fold_mont_shards(tbls, c)

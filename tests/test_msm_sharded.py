"""Sharded MSM over the CPU mesh vs single-device MSM / host naive.

Slow tier (SPT_SLOW=1): the Pippenger graph costs minutes of XLA compile
inside shard_map on CPU; correctness was validated in CI history and the
machinery is identical on real meshes.
"""
import os

import pytest

if not os.environ.get("SPT_SLOW"):
    pytest.skip("sharded-MSM compile is minutes on CPU; set SPT_SLOW=1", allow_module_level=True)

import jax.numpy as jnp
import numpy as np

from scroll_prover_tpu.curves.bn254_curve import G1, g1_generator, msm_naive
from scroll_prover_tpu.fields.bn254 import FR_MOD
from scroll_prover_tpu.fields.limbs import ints_to_limbs
from scroll_prover_tpu.ops import ec
from scroll_prover_tpu.parallel.mesh import make_mesh
from scroll_prover_tpu.parallel.msm_sharded import msm_sharded


def test_msm_sharded_matches_naive(rng):
    n = 64
    g = g1_generator()
    pts = [G1.mul(g, int(rng.integers(1, 2**61))) for _ in range(n)]
    scalars = [int.from_bytes(rng.bytes(40), "little") % FR_MOD for _ in range(n)]
    mesh = make_mesh(8)
    out = msm_sharded(
        mesh,
        jnp.asarray(ec.encode_affine_mont(pts)),
        jnp.asarray(ints_to_limbs(scalars)),
    )
    got = ec.decode_point(out)
    assert got == msm_naive(pts, scalars)


def test_msm_sharded_zero_heavy(rng):
    n = 32
    g = g1_generator()
    pts = [G1.mul(g, i + 1) for i in range(n)]
    scalars = [0] * (n - 2) + [7, FR_MOD - 1]
    mesh = make_mesh(4)
    out = msm_sharded(
        mesh,
        jnp.asarray(ec.encode_affine_mont(pts)),
        jnp.asarray(ints_to_limbs(scalars)),
    )
    assert ec.decode_point(out) == msm_naive(pts, scalars)

"""Device EC complete formulas + Pippenger MSM vs host ground truth."""
import jax.numpy as jnp
import numpy as np
import pytest

from scroll_prover_tpu.curves.bn254_curve import G1, g1_generator, msm_naive
from scroll_prover_tpu.fields.bn254 import FR_MOD
from scroll_prover_tpu.fields.limbs import ints_to_limbs
from scroll_prover_tpu.ops import ec, msm


def _host_points(rng, n):
    g = g1_generator()
    return [G1.mul(g, int(rng.integers(1, 2**60))) for _ in range(n)]


def test_add_double_matches_host(rng):
    pts = _host_points(rng, 8)
    dev = ec.from_affine(jnp.asarray(ec.encode_affine_mont(pts)))
    # pairwise adds
    lo = ec.PointP(dev.x[:4], dev.y[:4], dev.z[:4])
    hi = ec.PointP(dev.x[4:], dev.y[4:], dev.z[4:])
    s = ec.add(lo, hi)
    for i in range(4):
        got = ec.decode_point(ec.PointP(s.x[i], s.y[i], s.z[i]))
        assert got == G1.add(pts[i], pts[4 + i])
    # doubling
    d = ec.double(dev)
    for i in range(8):
        got = ec.decode_point(ec.PointP(d.x[i], d.y[i], d.z[i]))
        assert got == G1.double(pts[i])


def test_add_identity_and_inverse(rng):
    pts = _host_points(rng, 2)
    dev = ec.from_affine(jnp.asarray(ec.encode_affine_mont(pts)))
    idn = ec.identity((2,))
    s = ec.add(dev, idn)
    for i in range(2):
        assert ec.decode_point(ec.PointP(s.x[i], s.y[i], s.z[i])) == pts[i]
    # P + (-P) = identity
    s2 = ec.add(dev, ec.neg(dev))
    assert bool(ec.is_identity(s2).all())


def test_add_is_doubling_safe(rng):
    pts = _host_points(rng, 3)
    dev = ec.from_affine(jnp.asarray(ec.encode_affine_mont(pts)))
    s = ec.add(dev, dev)  # complete formulas must handle P + P
    for i in range(3):
        assert ec.decode_point(ec.PointP(s.x[i], s.y[i], s.z[i])) == G1.double(pts[i])


@pytest.mark.parametrize(
    "n",
    [64]
    + ([1, 7] if __import__("os").environ.get("SPT_SLOW") else []),
)
def test_msm_matches_naive(rng, n):
    pts = _host_points(rng, n)
    scalars = [int(rng.integers(0, 2**63)) * int(rng.integers(0, 2**63)) for _ in range(n)]
    want = msm_naive(pts, scalars)
    got = msm.msm_host(pts, scalars)
    assert got == want


def test_msm_edge_scalars(rng):
    g = g1_generator()
    pts = _host_points(rng, 4)
    scalars = [0, 1, FR_MOD - 1, 2**255 % FR_MOD]
    want = msm_naive(pts, scalars)
    got = msm.msm_host(pts, scalars)
    assert got == want


def test_msm_all_zero(rng):
    pts = _host_points(rng, 4)
    assert msm.msm_host(pts, [0, 0, 0, 0]) is None


def test_add_reduce(rng):
    pts = _host_points(rng, 5)
    dev = ec.from_affine(jnp.asarray(ec.encode_affine_mont(pts)))
    total = ec.add_reduce(dev)
    want = None
    for p in pts:
        want = G1.add(want, p)
    assert ec.decode_point(total) == want

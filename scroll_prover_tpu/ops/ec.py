"""Device (JAX/TPU) BN254 G1 arithmetic on limb planes.

Points are homogeneous projective (X, Y, Z) triples of (n, N_LIMBS) uint32
limb arrays in Montgomery form, on the curve Y^2 Z = X^3 + 3 Z^3. Addition
uses the complete formulas of Renes-Costello-Batina 2015 (Algorithm 7,
a = 0): branch-free, identity- and doubling-safe — exactly what a SIMD/VPU
execution model wants (no data-dependent control flow under jit).

Replaces the CPU Jacobian arithmetic of the halo2curves fork consumed by the
reference (SURVEY.md L0; integration/src/prove.rs:1). Ground truth:
curves/bn254_curve.py.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bn254 import FQ_MOD
from ..fields.limbs import FQ_LIMB, N_LIMBS, ints_to_limbs, limbs_to_ints
from . import field_ops as fo

F = FQ_LIMB
# Montgomery form of b3 = 3*b = 9
_B3_MONT = ints_to_limbs([9 * (1 << 256) % FQ_MOD])[0]


class PointP(NamedTuple):
    """Projective G1 points: each field is (..., N_LIMBS) uint32, Montgomery."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray


def identity(shape=()) -> PointP:
    zero = jnp.zeros((*shape, N_LIMBS), dtype=jnp.uint32)
    return PointP(zero, fo.one_mont(F, shape), zero)


def is_identity(p: PointP):
    return fo.is_zero(p.z)


def select_point(mask, a: PointP, b: PointP) -> PointP:
    return PointP(
        fo.select(mask, a.x, b.x),
        fo.select(mask, a.y, b.y),
        fo.select(mask, a.z, b.z),
    )


def from_affine(xy) -> PointP:
    """(..., 2, N_LIMBS) Montgomery affine (on curve, not identity) -> projective."""
    x = xy[..., 0, :]
    y = xy[..., 1, :]
    return PointP(x, y, fo.one_mont(F, x.shape[:-1]))


def neg(p: PointP) -> PointP:
    return PointP(p.x, fo.neg_mod(F, p.y), p.z)


@jax.jit
def add(p: PointP, q: PointP) -> PointP:
    """Complete projective addition (RCB15 alg. 7, a=0, b3=9)."""
    mul = partial(fo.mont_mul, F)
    add_ = partial(fo.add_mod, F)
    sub = partial(fo.sub_mod, F)
    b3 = jnp.broadcast_to(jnp.asarray(_B3_MONT, dtype=jnp.uint32), p.x.shape)

    t0 = mul(p.x, q.x)
    t1 = mul(p.y, q.y)
    t2 = mul(p.z, q.z)
    t3 = mul(add_(p.x, p.y), add_(q.x, q.y))
    t3 = sub(t3, add_(t0, t1))
    t4 = mul(add_(p.y, p.z), add_(q.y, q.z))
    t4 = sub(t4, add_(t1, t2))
    x3 = mul(add_(p.x, p.z), add_(q.x, q.z))
    y3 = sub(x3, add_(t0, t2))
    x3 = add_(t0, t0)
    t0 = add_(x3, t0)
    t2 = mul(b3, t2)
    z3 = add_(t1, t2)
    t1 = sub(t1, t2)
    y3 = mul(b3, y3)
    x3 = mul(t4, y3)
    t2 = mul(t3, t1)
    x3 = sub(t2, x3)
    y3 = mul(y3, t0)
    t1 = mul(t1, z3)
    y3 = add_(t1, y3)
    t0 = mul(t0, t3)
    z3 = mul(z3, t4)
    z3 = add_(z3, t0)
    return PointP(x3, y3, z3)


@jax.jit
def madd(p: PointP, qx: jnp.ndarray, qy: jnp.ndarray) -> PointP:
    """Mixed addition p + (qx, qy, 1) (RCB15 alg. 8, a=0, b3=9): 11 muls vs
    12 for the full add. Complete in p (identity-safe); q must be a real
    affine point (the MSM bucket kernel only feeds SRS points here)."""
    mul = partial(fo.mont_mul, F)
    add_ = partial(fo.add_mod, F)
    sub = partial(fo.sub_mod, F)
    b3 = jnp.broadcast_to(jnp.asarray(_B3_MONT, dtype=jnp.uint32), p.x.shape)

    t0 = mul(p.x, qx)
    t1 = mul(p.y, qy)
    t3 = add_(qx, qy)
    t4 = add_(p.x, p.y)
    t3 = mul(t3, t4)
    t4 = add_(t0, t1)
    t3 = sub(t3, t4)
    t4 = mul(qy, p.z)
    t4 = add_(t4, p.y)
    y3 = mul(qx, p.z)
    y3 = add_(y3, p.x)
    x3 = add_(t0, t0)
    t0 = add_(x3, t0)
    t2 = mul(b3, p.z)
    z3 = add_(t1, t2)
    t1 = sub(t1, t2)
    y3 = mul(b3, y3)
    x3 = mul(t4, y3)
    t2 = mul(t3, t1)
    x3 = sub(t2, x3)
    y3 = mul(y3, t0)
    t1 = mul(t1, z3)
    y3 = add_(t1, y3)
    t0 = mul(t0, t3)
    z3 = mul(z3, t4)
    z3 = add_(z3, t0)
    return PointP(x3, y3, z3)


@jax.jit
def double(p: PointP) -> PointP:
    """Complete projective doubling (RCB15 alg. 9, a=0, b3=9)."""
    mul = partial(fo.mont_mul, F)
    add_ = partial(fo.add_mod, F)
    sub = partial(fo.sub_mod, F)
    b3 = jnp.broadcast_to(jnp.asarray(_B3_MONT, dtype=jnp.uint32), p.x.shape)

    t0 = mul(p.y, p.y)
    z3 = add_(t0, t0)
    z3 = add_(z3, z3)
    z3 = add_(z3, z3)
    t1 = mul(p.y, p.z)
    t2 = mul(p.z, p.z)
    t2 = mul(b3, t2)
    x3 = mul(t2, z3)
    y3 = add_(t0, t2)
    z3 = mul(t1, z3)
    t1 = add_(t2, t2)
    t2 = add_(t1, t2)
    t0 = sub(t0, t2)
    y3 = mul(t0, y3)
    y3 = add_(x3, y3)
    t1 = mul(p.x, p.y)
    x3 = mul(t0, t1)
    x3 = add_(x3, x3)
    return PointP(x3, y3, z3)


def add_reduce(p: PointP) -> PointP:
    """Tree-reduce a batch of points (n, L) -> single point (L,).

    Pads to a power of two with the identity (complete formulas make that
    free of special cases), then log2(n) halving rounds of vector adds.
    """
    n = p.x.shape[0]
    m = 1 << max(n - 1, 1).bit_length() if n > 1 else 1
    if m != n:
        pad = identity((m - n,))
        p = PointP(*(jnp.concatenate([a, b]) for a, b in zip(p, pad)))
    while m > 1:
        half = m // 2
        lo = PointP(p.x[:half], p.y[:half], p.z[:half])
        hi = PointP(p.x[half:], p.y[half:], p.z[half:])
        p = add(lo, hi)
        m = half
    return PointP(p.x[0], p.y[0], p.z[0])


# --- host conversion helpers (tests / readback) -------------------------------


def encode_affine_mont(points) -> np.ndarray:
    """Host affine int pairs [(x, y) or None ...] -> (n, 2, N_LIMBS) Montgomery.

    Identity is encoded as (0, 0); from_affine must not receive it (use
    masks), but MSM treats zero-scalar entries itself so inputs here should
    be real points.
    """
    xs, ys = [], []
    for pt in points:
        if pt is None:
            xs.append(0)
            ys.append(0)
        else:
            xs.append(pt[0] * (1 << 256) % FQ_MOD)
            ys.append(pt[1] * (1 << 256) % FQ_MOD)
    out = np.stack([ints_to_limbs(xs), ints_to_limbs(ys)], axis=1)
    return out


def decode_point(p: PointP):
    """Single device point -> host affine int pair or None."""
    x, y, z = (limbs_to_ints(np.asarray(v).reshape(1, N_LIMBS))[0] for v in p)
    rinv = pow(1 << 256, -1, FQ_MOD)
    x, y, z = (v * rinv % FQ_MOD for v in (x, y, z))
    if z == 0:
        return None
    zinv = pow(z, -1, FQ_MOD)
    return (x * zinv % FQ_MOD, y * zinv % FQ_MOD)

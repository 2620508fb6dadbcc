"""Device group-(i)NTT over G1: FFT where values are curve points and
twiddles are Fr scalars.

The one consumer is SRS.downsize — rebuilding the Lagrange G1 basis from
the truncated monomial basis, lag[i] = (1/n) sum_j omega^{-ij} powers[j],
which is exactly an inverse NTT over the group (reference: ParamsKZG::
downsize over 2^26 ceremony files, integration/tests/integration.rs:12-22).
Round-1 did this as n host MSMs (O(n^2) point ops, unusable beyond toy k);
here it is a radix-2 Cooley-Tukey ladder on device: k stages, each one
batched 254-bit double-and-add scalar mult over n/2 lanes plus two
complete-formula adds — O(n log n) point ops, all limb-plane vector code.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bn254 import FR_MOD, FR_ROOT_OF_UNITY, FR_TWO_ADICITY
from ..fields.limbs import N_LIMBS
from . import ec
from . import field_ops as fo


def _bits_dev(scalars: list[int], nbits: int = 254) -> jnp.ndarray:
    """(nbits, n) uint32 bit planes, LSB first."""
    n = len(scalars)
    out = np.zeros((nbits, n), dtype=np.uint32)
    for j, s in enumerate(scalars):
        s = int(s) % FR_MOD
        i = 0
        while s:
            out[i, j] = s & 1
            s >>= 1
            i += 1
    return jnp.asarray(out)


@jax.jit
def _mul_bits(p: ec.PointP, bits: jnp.ndarray) -> ec.PointP:
    """Per-lane variable scalar mult: p (n lanes), bits (254, n) LSB-first."""
    nlanes = p.x.shape[0]
    acc = ec.identity((nlanes,))

    def body(i, carry):
        acc, base = carry
        take = bits[i] == 1  # (n,); select_point broadcasts over limbs
        acc = ec.select_point(take, ec.add(acc, base), acc)
        return acc, ec.double(base)

    acc, _ = jax.lax.fori_loop(0, bits.shape[0], body, (acc, p))
    return acc


@jax.jit
def _butterfly(p: ec.PointP, idx_a, idx_b, bits):
    """One radix-2 stage: gather (a, b) lanes, tb = [tw]b,
    scatter a+tb at idx_a and a-tb at idx_b."""
    take = lambda v, idx: jnp.take(v, idx, axis=0)
    a = ec.PointP(take(p.x, idx_a), take(p.y, idx_a), take(p.z, idx_a))
    b = ec.PointP(take(p.x, idx_b), take(p.y, idx_b), take(p.z, idx_b))
    tb = _mul_bits(b, bits)
    hi = ec.add(a, tb)
    lo = ec.add(a, ec.neg(tb))
    out = []
    for coord in range(3):
        v = p[coord]
        v = v.at[idx_a].set(hi[coord])
        v = v.at[idx_b].set(lo[coord])
        out.append(v)
    return ec.PointP(*out)


def group_intt_points(points: list, k: int) -> list:
    """Host affine int pairs (len 2^k, no identities) -> inverse-NTT'd
    host affine int pairs (identity -> None)."""
    n = 1 << k
    assert len(points) == n
    p = ec.from_affine(jnp.asarray(ec.encode_affine_mont(points)))

    # bit-reversal permutation
    rev = np.zeros(n, dtype=np.int32)
    for i in range(n):
        rev[i] = int(format(i, f"0{k}b")[::-1], 2) if k else 0
    p = ec.PointP(p.x[rev], p.y[rev], p.z[rev])

    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - k), FR_MOD)
    omega_inv = pow(omega, -1, FR_MOD)

    lanes = np.arange(n, dtype=np.int32)
    for s in range(1, k + 1):
        size = 1 << s
        half = size >> 1
        w = pow(omega_inv, n >> s, FR_MOD)
        tw = [1] * half
        for t in range(1, half):
            tw[t] = tw[t - 1] * w % FR_MOD
        pos = lanes % size
        idx_a = lanes[pos < half]
        idx_b = idx_a + half
        bits = _bits_dev([tw[t % half] for t in range(len(idx_b))])
        p = _butterfly(p, jnp.asarray(idx_a), jnp.asarray(idx_b), bits)

    ninv = pow(n, -1, FR_MOD)
    p = _mul_bits(p, _bits_dev([ninv] * n))
    return _decode_batch(p)


def _decode_batch(p: ec.PointP) -> list:
    """(n,)-lane projective -> host affine int pairs (None for identity),
    with ONE batched device inversion of Z."""
    from ..fields.bn254 import FQ_MOD
    from ..fields.limbs import FQ_LIMB, limbs_to_ints

    zinv = fo.batch_inv_mont(FQ_LIMB, p.z)
    ax = fo.from_mont(FQ_LIMB, fo.mont_mul(FQ_LIMB, p.x, zinv))
    ay = fo.from_mont(FQ_LIMB, fo.mont_mul(FQ_LIMB, p.y, zinv))
    zz = fo.from_mont(FQ_LIMB, p.z)
    xs = limbs_to_ints(np.asarray(ax))
    ys = limbs_to_ints(np.asarray(ay))
    zs = limbs_to_ints(np.asarray(zz))
    out = []
    for x, y, z in zip(xs, ys, zs):
        out.append(None if z == 0 else (x % FQ_MOD, y % FQ_MOD))
    return out

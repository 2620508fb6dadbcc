"""Pippenger multi-scalar multiplication on TPU.

MSM(points, scalars) = sum_i scalars[i] * points[i] over BN254 G1 — the
dominant cost of KZG commitment and opening (reference hot path:
SURVEY.md section 3.1 "MSM over 2^20 SRS"; halo2_proofs' CPU Pippenger at
SURVEY.md section 2.2).

TPU-shaped design (static shapes, no data-dependent control flow):
  * scalars split into 256/C windows of C bits; digits are plain uint32
    slices of the 16-bit limb planes.
  * per window, points are sorted by digit (u32 argsort — cheap) and
    per-bucket sums come from ONE segmented Hillis-Steele scan whose body is
    a single complete point addition (ops/ec.py) vectorized over n lanes —
    the log2(n) iterations run under lax.fori_loop so XLA compiles exactly
    one butterfly body (compile time was the bottleneck with unrolled
    associative_scan graphs).
  * bucket sums B_j are gathered at run ends; sum_j j*B_j = sum of suffix
    sums, two more Hillis-Steele scans over the 2^C buckets.
  * windows fold MSB->LSB with C doublings per fold (lax.scan, one body).

Work is n*log2(n) point adds per window — fully vectorized; the planned
upgrade is a (bucket, capacity)-matrix layout with O(n) adds in a Pallas
kernel. Cross-chip sharding (points split over the mesh, window/bucket sums
reduced with collectives) lives in parallel/msm_sharded.py.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.limbs import LIMB_BITS, N_LIMBS
from . import ec

C = 8  # window bits; 256/C windows, 2^C buckets
N_WINDOWS = 256 // C
N_BUCKETS = 1 << C


def _digits(scalars: jnp.ndarray) -> jnp.ndarray:
    """(n, N_LIMBS) standard-form scalar limbs -> (N_WINDOWS, n) uint32 digits,
    window 0 = least significant."""
    per_limb = LIMB_BITS // C
    parts = []
    for w in range(N_WINDOWS):
        limb = w // per_limb
        shift = (w % per_limb) * C
        parts.append((scalars[:, limb] >> shift) & jnp.uint32(N_BUCKETS - 1))
    return jnp.stack(parts)


def _shift_down(a, s):
    """a[i-s] with identity-ish zeros shifted in (callers mask i < s)."""
    return jnp.roll(a, s, axis=0)


def _seg_scan(pts: ec.PointP, flags: jnp.ndarray) -> ec.PointP:
    """Segmented inclusive prefix scan of point addition.

    flags[i] = True marks the start of a segment. One vectorized add body
    under fori_loop over ceil(log2(n)) steps (Hillis-Steele).
    """
    n = flags.shape[0]
    steps = max((n - 1).bit_length(), 1)
    pos = jnp.arange(n, dtype=jnp.uint32)

    def body(k, carry):
        v, f = carry
        s = jnp.uint32(1) << k
        vs = ec.PointP(*(jnp.roll(a, s, axis=0) for a in v))
        fs = jnp.roll(f, s, axis=0)
        valid = (pos >= s) & ~f
        merged = ec.add(v, vs)
        v2 = ec.select_point(valid, merged, v)
        f2 = f | jnp.where(pos >= s, fs, True)
        return (v2, f2)

    v, _ = jax.lax.fori_loop(0, steps, body, (pts, flags))
    return v


def _scan_points(pts: ec.PointP, reverse: bool = False) -> ec.PointP:
    """Plain inclusive prefix (or suffix) scan of point addition."""
    n = pts.x.shape[0]
    flags = jnp.zeros((n,), bool).at[0].set(True)
    if reverse:
        rev = ec.PointP(*(a[::-1] for a in pts))
        out = _seg_scan(rev, flags)
        return ec.PointP(*(a[::-1] for a in out))
    return _seg_scan(pts, flags)


def _bucket_window(points: ec.PointP, digits: jnp.ndarray) -> ec.PointP:
    """One window: returns S = sum_j j * B_j as a single projective point."""
    n = digits.shape[0]
    order = jnp.argsort(digits)
    d_sorted = digits[order]
    pts = ec.PointP(points.x[order], points.y[order], points.z[order])
    # zero digits contribute nothing; make them identity so their segment sums
    # to identity regardless of size
    nz = d_sorted != 0
    pts = ec.select_point(nz, pts, ec.identity((n,)))

    flags = jnp.concatenate(
        [jnp.ones((1,), bool), d_sorted[1:] != d_sorted[:-1]]
    )
    prefix = _seg_scan(pts, flags)

    # bucket totals j = 1..B-1 live at the last element of each digit's run
    js = jnp.arange(1, N_BUCKETS, dtype=jnp.uint32)
    starts = jnp.searchsorted(d_sorted, js, side="left")
    stops = jnp.searchsorted(d_sorted, js, side="right")
    has = stops > starts
    ends = jnp.where(has, stops - 1, 0)
    bsum = ec.PointP(prefix.x[ends], prefix.y[ends], prefix.z[ends])
    bsum = ec.select_point(has, bsum, ec.identity((N_BUCKETS - 1,)))

    # sum_j j*B_j = sum_j suffix_j; suffix scan then total via prefix scan
    suffix = _scan_points(bsum, reverse=True)
    total = _scan_points(suffix)
    return ec.PointP(total.x[-1], total.y[-1], total.z[-1])


@jax.jit
def msm(points_affine_mont: jnp.ndarray, scalar_limbs: jnp.ndarray) -> ec.PointP:
    """points: (n, 2, N_LIMBS) Montgomery affine; scalars: (n, N_LIMBS)
    standard-form limbs. Returns one projective point."""
    pts = ec.from_affine(points_affine_mont)
    digs = _digits(scalar_limbs)

    def dbl_body(_, p):
        return ec.double(p)

    def body(acc, d):
        acc = jax.lax.fori_loop(0, C, dbl_body, acc)
        s = _bucket_window(pts, d)
        one = ec.PointP(s.x[None], s.y[None], s.z[None])
        accb = ec.PointP(acc.x[None], acc.y[None], acc.z[None])
        out = ec.add(accb, one)
        return ec.PointP(out.x[0], out.y[0], out.z[0]), None

    acc, _ = jax.lax.scan(body, ec.identity(), digs[::-1])
    return acc


MIN_PAD = 64  # canonical minimum size: all small MSMs share one compiled graph


def pad_size(n: int) -> int:
    return max(MIN_PAD, 1 << max(n - 1, 1).bit_length())


def msm_padded(points_affine_mont: jnp.ndarray, scalar_limbs: jnp.ndarray) -> ec.PointP:
    """msm() with inputs padded to a canonical power-of-two size (padding
    scalars are zero, so padding points — copies of row 0 — contribute
    nothing). Avoids one XLA compile per distinct n."""
    n = points_affine_mont.shape[0]
    m = pad_size(n)
    if m != n:
        reps = jnp.broadcast_to(
            points_affine_mont[:1], (m - n, *points_affine_mont.shape[1:])
        )
        points_affine_mont = jnp.concatenate([points_affine_mont, reps])
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.zeros((m - n, N_LIMBS), jnp.uint32)]
        )
    return msm(points_affine_mont, scalar_limbs)


def msm_host(points, scalars):
    """Host convenience: int points/scalars -> affine int result (or None)."""
    pa = jnp.asarray(ec.encode_affine_mont(points))
    from ..fields.limbs import ints_to_limbs

    sl = jnp.asarray(ints_to_limbs([int(s) for s in scalars]))
    return ec.decode_point(msm_padded(pa, sl))

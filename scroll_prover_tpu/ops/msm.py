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

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.limbs import LIMB_BITS, N_LIMBS
from . import ec
from . import field_ops as fo

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
def msm_scan(points_affine_mont: jnp.ndarray, scalar_limbs: jnp.ndarray) -> ec.PointP:
    """Legacy O(n log n) segmented-scan MSM (kept for cross-validation)."""
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


# --- O(n) bucket-matrix Pippenger ---------------------------------------------
#
# Design (replaces the O(n log n) segmented scan; VERDICT round-1 item 3):
#   * signed digits: window digits are recoded into [-2^(C-1), 2^(C-1)] with a
#     carry chain, so each window needs only 2^(C-1)+1 buckets (negative
#     digits add the NEGATED point). BN254 scalars < 2^254 leave the top
#     window carry-free.
#   * scatter accumulation: each (window w, lane l) owns a private bucket row
#     T[w, l, :]. The points are striped over V lanes; a lax.scan of n/V
#     steps does ONE mixed add per (w, l) per step and writes it back with a
#     collision-free scatter (every lane writes its own row). Total work:
#     n mixed adds per window — O(n), fully vectorized over W*V lanes.
#   * lane reduction: log2(V) halving rounds of complete adds -> (W, B)
#     bucket sums; weighted sum via two Hillis-Steele scans over B; windows
#     fold MSB->LSB with C doublings per step.
#
# Digit-0 contributions land in bucket 0, which the weighted sum discards —
# zero scalars and padding are free, no masking in the hot loop.

SIGNED_B = (1 << (C - 1)) + 1  # buckets 0..128; bucket 0 discarded
MSM_LANES = 128  # V: lanes per window (table = W * V * SIGNED_B points)


def _signed_digits(scalar_limbs: jnp.ndarray):
    """(n, L) standard limbs -> digits (W, n) uint32 in [0, 2^(C-1)] and
    signs (W, n) bool; scalar = sum_w (-1)^sign_w * digit_w * 2^(C*w)."""
    digs = _digits(scalar_limbs)  # (W, n) in [0, 256)
    half = jnp.uint32(1 << (C - 1))
    full = jnp.uint32(1 << C)

    def body(carry, d):
        e = d + carry
        # e in [0, 256]; e > 128 -> use e - 256 (negative), carry 1
        neg = e > half
        out = jnp.where(neg, full - e, e)
        return neg.astype(jnp.uint32), (out, neg)

    carry0 = jnp.zeros(digs.shape[1], jnp.uint32)
    carry, (out, signs) = jax.lax.scan(body, carry0, digs)
    # top carry is provably 0 for scalars < 2^254 (BN254 Fr)
    return out, signs


@jax.jit
def msm(points_affine_mont: jnp.ndarray, scalar_limbs: jnp.ndarray) -> ec.PointP:
    """points: (n, 2, N_LIMBS) Montgomery affine; scalars: (n, N_LIMBS)
    standard-form limbs. Returns one projective point. O(n) point adds."""
    n = points_affine_mont.shape[0]
    V = min(MSM_LANES, n)
    steps = n // V
    digs, signs = _signed_digits(scalar_limbs)  # (W, n)

    px = points_affine_mont[:, 0, :].reshape(steps, V, N_LIMBS)
    py = points_affine_mont[:, 1, :].reshape(steps, V, N_LIMBS)
    d_s = digs.reshape(N_WINDOWS, steps, V).transpose(1, 0, 2)  # (steps, W, V)
    s_s = signs.reshape(N_WINDOWS, steps, V).transpose(1, 0, 2)

    tbl = ec.identity((N_WINDOWS, V, SIGNED_B))
    w_idx = jnp.arange(N_WINDOWS, dtype=jnp.int32)[:, None]
    l_idx = jnp.arange(V, dtype=jnp.int32)[None, :]

    def body(t, inp):
        qx, qy, d, s = inp  # (V, L), (V, L), (W, V), (W, V)
        qx = jnp.broadcast_to(qx[None], (N_WINDOWS, V, N_LIMBS))
        qy = jnp.broadcast_to(qy[None], (N_WINDOWS, V, N_LIMBS))
        qy = fo.select(s, fo.neg_mod(ec.F, qy), qy)
        d = d.astype(jnp.int32)
        cur = ec.PointP(
            jnp.take_along_axis(t.x, d[..., None, None], axis=2)[:, :, 0],
            jnp.take_along_axis(t.y, d[..., None, None], axis=2)[:, :, 0],
            jnp.take_along_axis(t.z, d[..., None, None], axis=2)[:, :, 0],
        )
        new = ec.madd(cur, qx, qy)
        t = ec.PointP(
            t.x.at[w_idx, l_idx, d].set(new.x),
            t.y.at[w_idx, l_idx, d].set(new.y),
            t.z.at[w_idx, l_idx, d].set(new.z),
        )
        return t, None

    tbl, _ = jax.lax.scan(body, tbl, (px, py, d_s, s_s))

    # lane reduction: (W, V, B) -> (W, B)
    def halve(t):
        h = t.x.shape[1] // 2
        lo = ec.PointP(t.x[:, :h], t.y[:, :h], t.z[:, :h])
        hi = ec.PointP(t.x[:, h:], t.y[:, h:], t.z[:, h:])
        return ec.add(lo, hi)

    while tbl.x.shape[1] > 1:
        tbl = halve(tbl)
    buckets = ec.PointP(tbl.x[:, 0], tbl.y[:, 0], tbl.z[:, 0])  # (W, B)

    # weighted sum per window: sum_{b>=1} b * B_b = sum of suffix sums
    bsum = ec.PointP(buckets.x[:, 1:], buckets.y[:, 1:], buckets.z[:, 1:])
    suffix = _hs_scan_points(bsum, reverse=True)
    total = _hs_scan_points(suffix)
    win = ec.PointP(total.x[:, -1], total.y[:, -1], total.z[:, -1])  # (W,)

    # fold windows MSB -> LSB with C doublings per step
    def dbl_body(_, p):
        return ec.double(p)

    def fold(acc, i):
        acc = jax.lax.fori_loop(0, C, dbl_body, acc)
        s = ec.PointP(win.x[i], win.y[i], win.z[i])
        one = ec.PointP(s.x[None], s.y[None], s.z[None])
        accb = ec.PointP(acc.x[None], acc.y[None], acc.z[None])
        out = ec.add(accb, one)
        return ec.PointP(out.x[0], out.y[0], out.z[0]), None

    acc, _ = jax.lax.scan(fold, ec.identity(), jnp.arange(N_WINDOWS - 1, -1, -1))
    return acc


def _hs_scan_points(pts: ec.PointP, reverse: bool = False) -> ec.PointP:
    """Inclusive Hillis-Steele prefix scan of point addition along axis 1
    (batched over axis 0). Small inputs only (the B-bucket weighted sum)."""
    if reverse:
        rev = ec.PointP(*(a[:, ::-1] for a in pts))
        out = _hs_scan_points(rev)
        return ec.PointP(*(a[:, ::-1] for a in out))
    n = pts.x.shape[1]
    steps = max((n - 1).bit_length(), 1)
    pos = jnp.arange(n, dtype=jnp.uint32)[None, :]

    def body(k, v):
        s = jnp.uint32(1) << k
        vs = ec.PointP(*(jnp.roll(a, s, axis=1) for a in v))
        merged = ec.add(v, vs)
        keep = jnp.broadcast_to(pos >= s, v.x.shape[:2])
        return ec.select_point(keep, merged, v)

    return jax.lax.fori_loop(0, steps, body, pts)


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


# --- select-based bucket MSM (no scatter: TPU-native) --------------------------
#
# The scatter-accumulate msm() above is correct but XLA lowers its
# gather/scatter over (W, V, B) tables to serialized dynamic slices on TPU
# (~0.02 Mpts/s measured). This variant trades window width for pure
# select/where updates: 4-bit signed digits give 9 buckets per window, and
# each scan step rewrites every bucket with `where(digit == b, new, old)` —
# a dense, fully-vectorized update. HBM traffic per step is the whole
# (W4, V, 9) table, which is why the small bucket count wins: the traffic
# product W*B is 64*9 = 576 vs 32*129 = 4128 for 8-bit windows.

C4 = 4
W4 = 256 // C4  # 64 windows
B4 = (1 << (C4 - 1)) + 1  # buckets 0..8 (signed digits), bucket 0 discarded


def _signed_digits4(scalar_limbs: jnp.ndarray):
    """(n, L) standard limbs -> digits (W4, n) in [0, 8], signs (W4, n)."""
    per_limb = LIMB_BITS // C4
    parts = []
    for w in range(W4):
        limb = w // per_limb
        shift = (w % per_limb) * C4
        parts.append((scalar_limbs[:, limb] >> shift) & jnp.uint32(15))
    digs = jnp.stack(parts)  # (W4, n) in [0, 16)
    half = jnp.uint32(1 << (C4 - 1))
    full = jnp.uint32(1 << C4)

    def body(carry, d):
        e = d + carry
        neg = e > half
        out = jnp.where(neg, full - e, e)
        return neg.astype(jnp.uint32), (out, neg)

    carry0 = jnp.zeros(digs.shape[1], jnp.uint32)
    _carry, (out, signs) = jax.lax.scan(body, carry0, digs)
    return out, signs


MSM_LANES4 = int(os.environ.get("SPT_MSM_LANES", "256"))


@jax.jit
def msm_onehot(points_affine_mont: jnp.ndarray, scalar_limbs: jnp.ndarray) -> ec.PointP:
    """O(n) bucket MSM with select-based accumulation. points: (n, 2, L)
    Montgomery affine; scalars: (n, L) standard limbs -> projective point."""
    n = points_affine_mont.shape[0]
    V = min(MSM_LANES4, n)
    steps = n // V
    assert steps * V == n, "n must be a multiple of the lane count"
    digs, signs = _signed_digits4(scalar_limbs)  # (W4, n)

    px = points_affine_mont[:, 0, :].reshape(steps, V, N_LIMBS)
    py = points_affine_mont[:, 1, :].reshape(steps, V, N_LIMBS)
    d_s = digs.reshape(W4, steps, V).transpose(1, 0, 2)  # (steps, W4, V)
    s_s = signs.reshape(W4, steps, V).transpose(1, 0, 2)

    tbl = ec.identity((W4, V, B4))
    b_idx = jnp.arange(B4, dtype=jnp.uint32)[None, None, :]  # (1, 1, B4)

    def body(t, inp):
        qx, qy, d, s = inp
        qx = jnp.broadcast_to(qx[None], (W4, V, N_LIMBS))
        qy = jnp.broadcast_to(qy[None], (W4, V, N_LIMBS))
        qy = fo.select(s, fo.neg_mod(ec.F, qy), qy)
        # current bucket content for each (w, lane): select over the 9 slots
        sel = d[..., None] == b_idx  # (W4, V, B4) one-hot
        cur = ec.PointP(
            jnp.sum(jnp.where(sel[..., None], t.x, 0), axis=2),
            jnp.sum(jnp.where(sel[..., None], t.y, 0), axis=2),
            jnp.sum(jnp.where(sel[..., None], t.z, 0), axis=2),
        )
        new = ec.madd(cur, qx, qy)
        t = ec.PointP(
            jnp.where(sel[..., None], new.x[:, :, None, :], t.x),
            jnp.where(sel[..., None], new.y[:, :, None, :], t.y),
            jnp.where(sel[..., None], new.z[:, :, None, :], t.z),
        )
        return t, None

    tbl, _ = jax.lax.scan(body, tbl, (px, py, d_s, s_s))

    # lane reduction: (W4, V, B4) -> (W4, B4)
    while tbl.x.shape[1] > 1:
        h = tbl.x.shape[1] // 2
        lo = ec.PointP(tbl.x[:, :h], tbl.y[:, :h], tbl.z[:, :h])
        hi = ec.PointP(tbl.x[:, h:], tbl.y[:, h:], tbl.z[:, h:])
        tbl = ec.add(lo, hi)
    buckets = ec.PointP(tbl.x[:, 0], tbl.y[:, 0], tbl.z[:, 0])  # (W4, B4)

    # weighted sum sum_{b=1..8} b*S_b via suffix sums (8 tiny vector adds)
    bsum = ec.PointP(buckets.x[:, 1:], buckets.y[:, 1:], buckets.z[:, 1:])
    suffix = _hs_scan_points(bsum, reverse=True)
    total = _hs_scan_points(suffix)
    win = ec.PointP(total.x[:, -1], total.y[:, -1], total.z[:, -1])  # (W4,)

    def dbl_body(_, p):
        return ec.double(p)

    def fold(acc, i):
        acc = jax.lax.fori_loop(0, C4, dbl_body, acc)
        s = ec.PointP(win.x[i], win.y[i], win.z[i])
        one = ec.PointP(s.x[None], s.y[None], s.z[None])
        accb = ec.PointP(acc.x[None], acc.y[None], acc.z[None])
        out = ec.add(accb, one)
        return ec.PointP(out.x[0], out.y[0], out.z[0]), None

    acc, _ = jax.lax.scan(fold, ec.identity(), jnp.arange(W4 - 1, -1, -1))
    return acc

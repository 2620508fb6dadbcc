"""Fused Pallas bucket-MSM: VMEM-resident buckets, select-based updates.

The composed-op MSMs in ops/msm.py are correct but HBM-traffic-bound on
TPU (every intermediate limb array round-trips HBM; XLA lowers their
gather/scatter to serialized dynamic slices — ~0.02 Mpts/s measured at
2^16). This kernel keeps the whole bucket table in VMEM scratch and fuses
the mixed-add arithmetic, following the ntt_tile.py playbook
(/opt/skills/guides/pallas_guide.md):

  * 4-bit signed windows: 64 windows x 9 buckets (digits in [-8, 8];
    bucket 0 is discarded, so zero digits and padding are free). The small
    bucket count is what makes select-based accumulation affordable — the
    per-step bucket sweep touches W*B = 576 bucket slots vs 4128 for 8-bit
    windows.
  * grid (window, point-tile), TPU-sequential: scratch bucket coords
    (9, L, 8, 128) persist across the point tiles of one window and reset
    at tile 0; each step does ONE fused RCB15 mixed add (complete in the
    bucket, identity-initialised) on an (8, 128) lane tile plus a one-hot
    select read/write of the 9 buckets.
  * points stream limb-major (L, tiles, 8, 128) from HBM once per window;
    signed digits/signs are precomputed host/device-side (the carry chain
    is sequential across windows).
  * the kernel is ACCUMULATE-ONLY: it dumps the per-lane bucket table
    (W, B, 3, L, 8, 128) to HBM at each window's last tile, and the
    1024-lane -> 1 tree reduction runs OUTSIDE as 10 rounds of vectorized
    complete adds (ops/ec.py). The previous in-kernel flush (7 unrolled
    complete adds) blew the Mosaic compile to 12+ minutes at SUB_T=1 and
    past 30 minutes at SUB_T=8; with it gone, SUB_T=8 fills all VPU
    sublanes for ~8x the accumulate throughput.

Capability anchor: halo2's variable-base Pippenger inside create_proof
(SURVEY.md section 3.1 hot path: "MSM over 2^20 SRS"); VERDICT round-2
items 2/3.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import FQ_LIMB, N_LIMBS, ints_to_limbs
from . import ec
from . import field_ops as fo
from .msm import _signed_digits4, _hs_scan_points, C4, W4, B4
from .ntt_tile import _kl_add, _kl_cond_sub, _kl_select, _kl_sub, _kl_sub_raw

FQ = FQ_LIMB
_MASK16 = np.uint32(0xFFFF)
_N0INV_Q = np.uint32(FQ.n0inv)

# sublane x lane tile: full native (8, 128) VPU tile. Affordable because
# the lane reduction happens outside the kernel (see module docstring).
SUB_T = 8


def _kl_mont_mul_q(p, a, b):
    """CIOS Montgomery product over Fq (same machinery as ntt_tile's Fr
    version, Fq n0inv)."""
    L = N_LIMBS
    shape = jnp.broadcast_shapes(a[0].shape, b[0].shape)
    t = [jnp.zeros(shape, jnp.uint32) for _ in range(2 * L)]
    for i in range(L):
        ai = a[i]
        for j in range(L):
            prod = ai * b[j]
            t[i + j] = t[i + j] + (prod & _MASK16)
            t[i + j + 1] = t[i + j + 1] + (prod >> 16)
    c = jnp.zeros(shape, jnp.uint32)
    for i in range(L):
        ti = t[i] + c
        m = (ti * _N0INV_Q) & _MASK16
        for j in range(L):
            prod = m * p[j]
            t[i + j] = t[i + j] + (prod & _MASK16)
            if i + j + 1 < 2 * L:
                t[i + j + 1] = t[i + j + 1] + (prod >> 16)
        c = (t[i] + c) >> 16
    res = t[L : 2 * L]
    res[0] = res[0] + c
    out = []
    cc = jnp.zeros(shape, jnp.uint32)
    for j in range(L):
        s = res[j] + cc
        out.append(s & _MASK16)
        cc = s >> 16
    return _kl_cond_sub(p, out, cc)


def _kl_madd(p, b3, X1, Y1, Z1, qx, qy):
    """RCB15 algorithm 8 (a=0, mixed, complete in the projective operand) —
    mirrors ops/ec.py madd with kernel-local limb lists."""
    mul = lambda a, b: _kl_mont_mul_q(p, a, b)
    add_ = lambda a, b: _kl_add(p, a, b)
    sub = lambda a, b: _kl_sub(p, a, b)

    t0 = mul(X1, qx)
    t1 = mul(Y1, qy)
    t3 = add_(qx, qy)
    t4 = add_(X1, Y1)
    t3 = mul(t3, t4)
    t4 = add_(t0, t1)
    t3 = sub(t3, t4)
    t4 = mul(qy, Z1)
    t4 = add_(t4, Y1)
    y3 = mul(qx, Z1)
    y3 = add_(y3, X1)
    x3 = add_(t0, t0)
    t0 = add_(x3, t0)
    t2 = mul(b3, Z1)
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
    return x3, y3, z3


def _kl_padd(p, b3, X1, Y1, Z1, X2, Y2, Z2):
    """RCB15 algorithm 7 (a=0, complete projective add) — mirrors ec.add
    with kernel-local limb lists."""
    mul = lambda a, b: _kl_mont_mul_q(p, a, b)
    add_ = lambda a, b: _kl_add(p, a, b)
    sub = lambda a, b: _kl_sub(p, a, b)

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    t3 = mul(add_(X1, Y1), add_(X2, Y2))
    t3 = sub(t3, add_(t0, t1))
    t4 = mul(add_(Y1, Z1), add_(Y2, Z2))
    t4 = sub(t4, add_(t1, t2))
    x3 = mul(add_(X1, Z1), add_(X2, Z2))
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
    return x3, y3, z3


def _msm_kernel(
    px_ref, py_ref, d_ref, s_ref, c_ref, o_ref, bx, by, bz, *, tiles: int,
    t_axis: int = 1,
):
    t = pl.program_id(t_axis)
    p = [c_ref[l, 0] for l in range(N_LIMBS)]
    b3 = [c_ref[l, 1] for l in range(N_LIMBS)]

    @pl.when(t == 0)
    def _init():
        bx[...] = jnp.zeros_like(bx)
        bz[...] = jnp.zeros_like(bz)
        for l in range(N_LIMBS):
            by[:, l] = jnp.broadcast_to(
                c_ref[l, 2], (by.shape[0],) + by.shape[2:]
            )

    qx = [px_ref[l, 0] for l in range(N_LIMBS)]
    qy = [py_ref[l, 0] for l in range(N_LIMBS)]
    d = d_ref[0, 0]  # (SUB_T, 128) uint32 in [0, 8]
    sgn = s_ref[0, 0] != 0
    zero = [jnp.zeros_like(q) for q in qy]
    neg_y = _kl_sub(p, zero, qy)
    qy = _kl_select(sgn, neg_y, qy)

    # one-hot read of the current bucket per lane
    curx = [jnp.zeros_like(d) for _ in range(N_LIMBS)]
    cury = [jnp.zeros_like(d) for _ in range(N_LIMBS)]
    curz = [jnp.zeros_like(d) for _ in range(N_LIMBS)]
    masks = [d == jnp.uint32(b) for b in range(B4)]
    for b in range(B4):
        m = masks[b]
        for l in range(N_LIMBS):
            curx[l] = jnp.where(m, bx[b, l], curx[l])
            cury[l] = jnp.where(m, by[b, l], cury[l])
            curz[l] = jnp.where(m, bz[b, l], curz[l])

    nx, ny, nz = _kl_madd(p, b3, curx, cury, curz, qx, qy)

    for b in range(B4):
        m = masks[b]
        for l in range(N_LIMBS):
            bx[b, l] = jnp.where(m, nx[l], bx[b, l])
            by[b, l] = jnp.where(m, ny[l], by[b, l])
            bz[b, l] = jnp.where(m, nz[l], bz[b, l])

    @pl.when(t == tiles - 1)
    def _flush():
        # dump the raw per-lane buckets; the lane tree-reduction runs
        # outside the kernel (keeps the Mosaic body small — module
        # docstring)
        for l in range(N_LIMBS):
            o_ref[0, :, 0, l] = bx[:, l]
            o_ref[0, :, 1, l] = by[:, l]
            o_ref[0, :, 2, l] = bz[:, l]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _msm_buckets_lanes(px, py, digs, signs, interpret: bool = False):
    """px/py: (L, tiles, SUB_T, 128); digs/signs: (W4, tiles, SUB_T, 128).
    Returns the raw (W4, B4, 3, L, SUB_T, 128) per-lane bucket table."""
    L, tiles, st, lanes = px.shape
    consts = jnp.asarray(_consts())
    pt_spec = pl.BlockSpec((L, 1, st, lanes), lambda w, t: (0, t, 0, 0))
    dg_spec = pl.BlockSpec((1, 1, st, lanes), lambda w, t: (w, t, 0, 0))
    return pl.pallas_call(
        functools.partial(_msm_kernel, tiles=tiles),
        out_shape=jax.ShapeDtypeStruct((W4, B4, 3, L, st, lanes), jnp.uint32),
        grid=(W4, tiles),
        in_specs=[
            pt_spec,
            pt_spec,
            dg_spec,
            dg_spec,
            pl.BlockSpec((L, 3), lambda w, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, B4, 3, L, st, lanes), lambda w, t: (w, 0, 0, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((B4, L, st, lanes), jnp.uint32),
            pltpu.VMEM((B4, L, st, lanes), jnp.uint32),
            pltpu.VMEM((B4, L, st, lanes), jnp.uint32),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(px, py, digs, signs, consts)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _msm_buckets_lanes_batch(px, py, digs, signs, interpret: bool = False):
    """Multi-column MSM over SHARED points: px/py (L, tiles, SUB_T, 128);
    digs/signs (C, W4, tiles, SUB_T, 128) — one digit set per column.
    Grid (C, W4, tiles): scratch buckets reset at each (column, window)'s
    tile 0, so one dispatch accumulates C independent bucket tables. The
    per-commit tunnel floor (RTT sync + readback) is paid ONCE per group
    instead of once per column (docs/PERF.md round-3 MSM floor)."""
    C = digs.shape[0]
    L, tiles, st, lanes = px.shape
    consts = jnp.asarray(_consts())
    # flatten (C, W4) into one grid-indexed leading axis so the kernel body
    # (which reads d_ref[0, 0]) is shared verbatim with the single-column path
    dflat = digs.reshape(C * W4, tiles, st, lanes)
    sflat = signs.reshape(C * W4, tiles, st, lanes)
    pt_spec = pl.BlockSpec((L, 1, st, lanes), lambda c, w, t: (0, t, 0, 0))
    dg_spec = pl.BlockSpec(
        (1, 1, st, lanes), lambda c, w, t: (c * W4 + w, t, 0, 0)
    )
    out = pl.pallas_call(
        functools.partial(_msm_kernel, tiles=tiles, t_axis=2),
        out_shape=jax.ShapeDtypeStruct(
            (C * W4, B4, 3, L, st, lanes), jnp.uint32
        ),
        grid=(C, W4, tiles),
        in_specs=[
            pt_spec,
            pt_spec,
            dg_spec,
            dg_spec,
            pl.BlockSpec((L, 3), lambda c, w, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, B4, 3, L, st, lanes), lambda c, w, t: (c * W4 + w, 0, 0, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((B4, L, st, lanes), jnp.uint32),
            pltpu.VMEM((B4, L, st, lanes), jnp.uint32),
            pltpu.VMEM((B4, L, st, lanes), jnp.uint32),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(px, py, dflat, sflat, consts)
    return out.reshape(C, W4, B4, 3, L, st, lanes)


@jax.jit
def _reduce_lanes(tbl: jnp.ndarray) -> jnp.ndarray:
    """(W4, B4, 3, L, SUB_T, 128) per-lane buckets -> (W4, B4, 3, L) via
    log2(SUB_T*128) rounds of vectorized complete adds (composed ops; this
    used to live inside the Pallas kernel and dominated its compile time)."""
    W, B, _, L, st, lanes = tbl.shape
    m = st * lanes
    # (W, B, L, st, lanes) -> (W, B, m, L)
    def lanes_last(c):
        return tbl[:, :, c].reshape(W, B, L, m).transpose(0, 1, 3, 2)

    p = ec.PointP(lanes_last(0), lanes_last(1), lanes_last(2))
    while m > 1:
        h = m // 2
        lo = ec.PointP(p.x[:, :, :h], p.y[:, :, :h], p.z[:, :, :h])
        hi = ec.PointP(p.x[:, :, h:], p.y[:, :, h:], p.z[:, :, h:])
        p = ec.add(lo, hi)
        m = h
    return jnp.stack([p.x[:, :, 0], p.y[:, :, 0], p.z[:, :, 0]], axis=2)


def _msm_buckets(px, py, digs, signs, interpret: bool = False):
    """Composed accumulate + lane-reduce: (W4, B4, 3, L) bucket table."""
    return _reduce_lanes(_msm_buckets_lanes(px, py, digs, signs, interpret))


_CONSTS = None


def _consts() -> np.ndarray:
    global _CONSTS
    if _CONSTS is None:
        p = FQ.modulus
        cols = [
            FQ.p_limbs,
            ints_to_limbs([9 * (1 << 256) % p])[0],  # b3 = 3b in Montgomery
            ints_to_limbs([(1 << 256) % p])[0],  # one in Montgomery
        ]
        _CONSTS = np.stack([np.asarray(c, np.uint32) for c in cols], axis=1)
    return _CONSTS


def msm_tile(
    points_affine_mont: jnp.ndarray,
    scalar_limbs: jnp.ndarray,
    interpret: bool = False,
) -> ec.PointP:
    """points: (n, 2, L) Montgomery affine; scalars: (n, L) standard limbs.
    Returns one projective point. Pads n up to a 1024 multiple with
    zero-scalar copies of point 0 (they land in the discarded bucket 0)."""
    tbl = _msm_tbl(points_affine_mont, scalar_limbs, interpret)
    return _reduce_buckets(tbl)


def msm_tile_host(
    points_affine_mont: jnp.ndarray,
    scalar_limbs: jnp.ndarray,
    interpret: bool = False,
):
    """Like msm_tile but the tiny (W4 x B4) bucket fold runs on HOST ints:
    the device tail was a ~320-op sequential chain of scalar-shaped kernels
    (the dominant fixed cost at ~1.3 s/MSM on the tunneled backend), while
    the host fold is ~1k Jacobian ops (~30 ms). Returns a host affine point
    or None — the shape kzg_commit wants anyway."""
    tbl = np.asarray(_msm_tbl(points_affine_mont, scalar_limbs, interpret))
    return _host_fold(tbl)


def msm_tile_host_batch(
    points_affine_mont: jnp.ndarray,
    scalar_limbs_list,
    interpret: bool = False,
):
    """C MSMs over SHARED points in ONE kernel dispatch + one readback.
    points: (n, 2, L) Montgomery affine; scalar_limbs_list: C arrays of
    (n_i, L) standard limbs with n_i <= n (shorter columns are zero-padded
    — zero digits land in the discarded bucket 0). Returns C host affine
    points (or None)."""
    if len(scalar_limbs_list) == 1:
        k = scalar_limbs_list[0]
        return [msm_tile_host(points_affine_mont[: k.shape[0]], k, interpret)]
    n = points_affine_mont.shape[0]
    lane = SUB_T * 128
    npad = (-n) % lane
    if npad:
        pad_pt = jnp.broadcast_to(
            points_affine_mont[:1], (npad,) + points_affine_mont.shape[1:]
        )
        points_affine_mont = jnp.concatenate([points_affine_mont, pad_pt])
        n += npad
    tiles = n // lane
    digs, signs = [], []
    for sl in scalar_limbs_list:
        pad = n - sl.shape[0]
        if pad:
            sl = jnp.concatenate([sl, jnp.zeros((pad, N_LIMBS), jnp.uint32)])
        d, s = _signed_digits4(sl)
        digs.append(d.reshape(W4, tiles, SUB_T, 128))
        signs.append(s.astype(jnp.uint32).reshape(W4, tiles, SUB_T, 128))
    px = points_affine_mont[:, 0, :].T.reshape(N_LIMBS, tiles, SUB_T, 128)
    py = points_affine_mont[:, 1, :].T.reshape(N_LIMBS, tiles, SUB_T, 128)
    lanes_tbl = _msm_buckets_lanes_batch(
        px, py, jnp.stack(digs), jnp.stack(signs), interpret
    )
    tbls = np.asarray(jax.vmap(_reduce_lanes)(lanes_tbl))
    return [_host_fold(t) for t in tbls]


def _host_fold(tbl: np.ndarray):
    """(W4, B4, 3, L) Montgomery projective bucket table -> host affine
    point (or None): suffix-sum each window's buckets, then the classic
    double-and-add window fold."""
    from ..curves.bn254_curve import G1
    from ..fields.limbs import limbs_to_ints

    flat = tbl.reshape(W4 * B4 * 3, N_LIMBS)
    ints = limbs_to_ints(np.asarray(fo.from_mont(FQ, jnp.asarray(flat))))
    total = None
    for w in range(W4 - 1, -1, -1):
        for _ in range(C4):
            total = G1.double(total) if total is not None else None
        # sum_b b * S_b via suffix sums
        run = None
        acc = None
        for b in range(B4 - 1, 0, -1):
            i = (w * B4 + b) * 3
            X, Y, Z = ints[i], ints[i + 1], ints[i + 2]
            pt = _proj_to_affine(X, Y, Z)
            if pt is not None:
                run = G1.add(run, pt)
            if run is not None:
                acc = G1.add(acc, run)
        if acc is not None:
            total = G1.add(total, acc)
    return total


def _proj_to_affine(X: int, Y: int, Z: int):
    from ..fields.bn254 import FQ_MOD

    if Z % FQ_MOD == 0:
        return None
    zi = pow(Z, -1, FQ_MOD)
    return (X * zi % FQ_MOD, Y * zi % FQ_MOD)


# =====================================================================
# v2 pipeline (round 4): out-block bucket accumulation + Pallas lane
# reduction + inversion-free host fold.
#
# Round-3 profiling on the chip (2^20 points): accumulate kernel 0.49 s,
# composed-op lane reduction 0.72 s, host fold 0.82 s — the kernel was
# near the VPU int-mul ceiling while everything AROUND it dominated wall
# time (VERDICT round-3 item 2). v2 changes:
#   * window size is parameterized (SPT_MSM_C, default 6): 43 signed
#     6-bit windows instead of 64 4-bit ones — 33% fewer mixed adds per
#     point for a +10% one-hot sweep (B=33 buckets, 6.5 MB out block —
#     fits VMEM now that the kernel accumulates INTO its output block,
#     which Pallas keeps resident across the point tiles of a window).
#   * the 1024-lane tree reduction is ONE Pallas kernel (sequential-grid
#     accumulator, 1-padd body) instead of 10 rounds of composed XLA ops
#     whose (…, L)-minor layout wasted 7/8 of every vector tile.
#   * the (W, B) bucket table reads back in Montgomery form (~0.3 MB)
#     and folds on HOST with branch-free projective bigint ops — no
#     modular inversions until the single final affine conversion. A
#     ~300-op device fold chain is NOT an option on this backend: a jit
#     of 256 sequential point doubles did not finish compiling in 500 s
#     (remote compile service; docs/PERF.md round 3).
# =====================================================================

MSM_C = int(os.environ.get("SPT_MSM_C", "6"))


def _wb(c: int):
    """Window count / bucket count for signed c-bit digits. Top-window
    overflow check: scalars < 2^254, so the top raw digit is at most
    2^(254 - c*(W-1)) - 1 plus one carry — <= 2^(c-1) for c in 4..8."""
    W = -(-256 // c)
    B = (1 << (c - 1)) + 1
    return W, B


@jax.jit
def _msm_prep_points(points_affine_mont):
    """(n, 2, L) Montgomery affine (n a lane multiple) -> px, py
    (L, tiles, st, 128)."""
    n = points_affine_mont.shape[0]
    tiles = n // (SUB_T * 128)
    px = points_affine_mont[:, 0, :].T.reshape(N_LIMBS, tiles, SUB_T, 128)
    py = points_affine_mont[:, 1, :].T.reshape(N_LIMBS, tiles, SUB_T, 128)
    return px, py


@functools.partial(jax.jit, static_argnames=("c",))
def _msm_prep_digits(scalar_limbs, c: int):
    """(n, L) standard scalar limbs (n a lane multiple) -> signed digits
    and signs, each (W, tiles, st, 128). One compiled program: the round-3
    eager prep (digit scan on (n,)-shaped arrays) cost 0.11 s at 2^20 from
    1-sublane tiling alone."""
    W, _B = _wb(c)
    n = scalar_limbs.shape[0]
    tiles = n // (SUB_T * 128)
    sl = scalar_limbs.reshape(tiles, SUB_T, 128, N_LIMBS)
    mask = jnp.uint32((1 << c) - 1)
    parts = []
    for w in range(W):
        bit = w * c
        limb = bit // 16
        sh = bit % 16
        v = sl[..., limb] >> sh
        if sh + c > 16 and limb + 1 < N_LIMBS:
            v = v | (sl[..., limb + 1] << (16 - sh))
        parts.append(v & mask)
    digs = jnp.stack(parts)  # (W, tiles, st, 128) in [0, 2^c)
    half = jnp.uint32(1 << (c - 1))
    full = jnp.uint32(1 << c)

    def body(carry, d):
        e = d + carry
        neg = e > half
        out = jnp.where(neg, full - e, e)
        return neg.astype(jnp.uint32), (out, neg.astype(jnp.uint32))

    carry0 = jnp.zeros(digs.shape[1:], jnp.uint32)
    _carry, (out, signs) = jax.lax.scan(body, carry0, digs)
    return out, signs


def _msm_accum_kernel(px_ref, py_ref, d_ref, s_ref, c_ref, o_ref, *, B: int, t_axis: int):
    """Accumulate one (window, point-tile) step directly into the output
    block (1, B, 3, L, st, 128), which Pallas keeps VMEM-resident across
    the tiles of a window (index map constant in t) — no scratch, no
    flush; VMEM budget is ONE bucket table instead of two."""
    t = pl.program_id(t_axis)
    p = [c_ref[l, 0] for l in range(N_LIMBS)]
    b3 = [c_ref[l, 1] for l in range(N_LIMBS)]

    @pl.when(t == 0)
    def _init():
        zero = jnp.zeros(o_ref.shape[1:2] + o_ref.shape[4:], jnp.uint32)
        for l in range(N_LIMBS):
            o_ref[0, :, 0, l] = zero
            o_ref[0, :, 2, l] = zero
            o_ref[0, :, 1, l] = jnp.broadcast_to(c_ref[l, 2], zero.shape)

    qx = [px_ref[l, 0] for l in range(N_LIMBS)]
    qy = [py_ref[l, 0] for l in range(N_LIMBS)]
    d = d_ref[0, 0]
    sgn = s_ref[0, 0] != 0
    zero = [jnp.zeros_like(q) for q in qy]
    neg_y = _kl_sub(p, zero, qy)
    qy = _kl_select(sgn, neg_y, qy)

    masks = [d == jnp.uint32(b) for b in range(B)]
    curx = [jnp.zeros_like(d) for _ in range(N_LIMBS)]
    cury = [jnp.zeros_like(d) for _ in range(N_LIMBS)]
    curz = [jnp.zeros_like(d) for _ in range(N_LIMBS)]
    for b in range(B):
        m = masks[b]
        for l in range(N_LIMBS):
            curx[l] = jnp.where(m, o_ref[0, b, 0, l], curx[l])
            cury[l] = jnp.where(m, o_ref[0, b, 1, l], cury[l])
            curz[l] = jnp.where(m, o_ref[0, b, 2, l], curz[l])

    nx, ny, nz = _kl_madd(p, b3, curx, cury, curz, qx, qy)

    for b in range(B):
        m = masks[b]
        for l in range(N_LIMBS):
            o_ref[0, b, 0, l] = jnp.where(m, nx[l], o_ref[0, b, 0, l])
            o_ref[0, b, 1, l] = jnp.where(m, ny[l], o_ref[0, b, 1, l])
            o_ref[0, b, 2, l] = jnp.where(m, nz[l], o_ref[0, b, 2, l])


@functools.partial(jax.jit, static_argnames=("B", "interpret"))
def _accum_v2(px, py, digs, signs, B: int, interpret: bool = False):
    """px/py (L, tiles, st, 128); digs/signs (WC, tiles, st, 128) where WC
    may be C*W flattened column-major (batch). Returns the per-lane bucket
    table (WC, B, 3, L, st, 128)."""
    L, tiles, st, lanes = px.shape
    WC = digs.shape[0]
    consts = jnp.asarray(_consts())
    pt_spec = pl.BlockSpec((L, 1, st, lanes), lambda w, t: (0, t, 0, 0))
    dg_spec = pl.BlockSpec((1, 1, st, lanes), lambda w, t: (w, t, 0, 0))
    return pl.pallas_call(
        functools.partial(_msm_accum_kernel, B=B, t_axis=1),
        out_shape=jax.ShapeDtypeStruct((WC, B, 3, L, st, lanes), jnp.uint32),
        grid=(WC, tiles),
        in_specs=[
            pt_spec,
            pt_spec,
            dg_spec,
            dg_spec,
            pl.BlockSpec((L, 3), lambda w, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, B, 3, L, st, lanes), lambda w, t: (w, 0, 0, 0, 0, 0)
        ),
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(px, py, digs, signs, consts)


def _lane_reduce_kernel(in_ref, c_ref, o_ref, *, steps: int):
    """Sequential-grid lane accumulator: grid (J, I) over a (3, L, m, Wp)
    table; the output block (3, L, 8, 128) is revisited across I, so 8
    sublane partial sums accumulate in VMEM with a 1-padd body."""
    i = pl.program_id(1)
    p = [c_ref[l, 0] for l in range(N_LIMBS)]
    b3 = [c_ref[l, 1] for l in range(N_LIMBS)]

    @pl.when(i == 0)
    def _init():
        zero = jnp.zeros(o_ref.shape[2:], jnp.uint32)
        for l in range(N_LIMBS):
            o_ref[0, l] = zero
            o_ref[2, l] = zero
            o_ref[1, l] = jnp.broadcast_to(c_ref[l, 2], zero.shape)

    ax = [o_ref[0, l] for l in range(N_LIMBS)]
    ay = [o_ref[1, l] for l in range(N_LIMBS)]
    az = [o_ref[2, l] for l in range(N_LIMBS)]
    bx = [in_ref[0, l] for l in range(N_LIMBS)]
    by = [in_ref[1, l] for l in range(N_LIMBS)]
    bz = [in_ref[2, l] for l in range(N_LIMBS)]
    nx, ny, nz = _kl_padd(p, b3, ax, ay, az, bx, by, bz)
    for l in range(N_LIMBS):
        o_ref[0, l] = nx[l]
        o_ref[1, l] = ny[l]
        o_ref[2, l] = nz[l]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _lane_reduce_v2(tbl, interpret: bool = False):
    """(WC, B, 3, L, st, 128) per-lane buckets -> (WC, B, 3, L) bucket
    table: transpose so the 1024 lane-slots ride the sublane axis and the
    (WC*B) bucket columns ride the lanes, one sequential-accumulator
    Pallas pass to 8 partial sums, then a 3-round composed tail on the
    tiny remainder."""
    WC, B, _3, L, st, lanes = tbl.shape
    m = st * lanes
    wb = WC * B
    wbp = -(-wb // 128) * 128
    t = tbl.transpose(2, 3, 4, 5, 0, 1).reshape(3, L, m, wb)
    if wbp != wb:
        # pad columns with identity points (z=0 is enough: padd treats
        # x=0,y=0,z=0 as... NOT identity; use y=one). Build explicit pad.
        padx = jnp.zeros((3, L, m, wbp - wb), jnp.uint32)
        one = jnp.asarray(_consts())[:, 2]
        pady = jnp.broadcast_to(one[None, :, None, None], (1, L, m, wbp - wb))
        pad = jnp.concatenate([padx[:1], pady, padx[:1]], axis=0)
        t = jnp.concatenate([t, pad], axis=3)
    consts = jnp.asarray(_consts())
    out = pl.pallas_call(
        functools.partial(_lane_reduce_kernel, steps=m // 8),
        out_shape=jax.ShapeDtypeStruct((3, L, 8, wbp), jnp.uint32),
        grid=(wbp // 128, m // 8),
        in_specs=[
            pl.BlockSpec((3, L, 8, 128), lambda j, i: (0, 0, i, j)),
            pl.BlockSpec((L, 3), lambda j, i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((3, L, 8, 128), lambda j, i: (0, 0, 0, j)),
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(t, consts)
    # composed 8 -> 1 sublane tail (tiny: 7 element-padds per column)
    p = [jnp.uint32(v) for v in np.asarray(FQ.p_limbs)]
    b3l = [jnp.uint32(v) for v in np.asarray(_consts())[:, 1]]
    x = [out[0, l] for l in range(L)]
    y = [out[1, l] for l in range(L)]
    z = [out[2, l] for l in range(L)]
    h = 4
    while h >= 1:
        lox = [a[:h] for a in x]; hix = [a[h : 2 * h] for a in x]
        loy = [a[:h] for a in y]; hiy = [a[h : 2 * h] for a in y]
        loz = [a[:h] for a in z]; hiz = [a[h : 2 * h] for a in z]
        x, y, z = _kl_padd(p, b3l, lox, loy, loz, hix, hiy, hiz)
        h //= 2
    flat = jnp.stack(
        [jnp.stack(x, 0), jnp.stack(y, 0), jnp.stack(z, 0)], 0
    )  # (3, L, 1, wbp)
    return flat[:, :, 0, :wb].transpose(2, 0, 1).reshape(WC, B, 3, L)


# --- host projective fold (Montgomery in, one inversion out) -------------

_R_INV = None


def _decode_mont_table(tbl: np.ndarray) -> list:
    """Flatten a (..., L) uint32 Montgomery table to standard-form ints."""
    from ..fields.bn254 import FQ_MOD as P

    global _R_INV
    if _R_INV is None:
        _R_INV = pow(1 << 256, -1, P)
    m = tbl.size // N_LIMBS
    flat = np.ascontiguousarray(tbl.reshape(m, N_LIMBS)).astype(np.uint16)
    buf = flat.astype("<u2").tobytes()
    rinv = _R_INV
    return [
        int.from_bytes(buf[32 * i : 32 * (i + 1)], "little") * rinv % P
        for i in range(m)
    ]


def _host_fold_mont(tbl: np.ndarray, c: int):
    """(W, B, 3, L) uint32 Montgomery projective bucket table -> affine
    int point or None. Branch-free complete projective adds (RCB15 alg 7,
    a=0) on Python ints; the only modular inversion is the final affine
    conversion. A leading shard axis (D, W, B, 3, L) is folded bucket-wise
    first (the multi-chip combine, parallel/msm_sharded.py)."""
    from ..fields.bn254 import FQ_MOD as P

    D = tbl.shape[0] if tbl.ndim == 5 else 1
    W, B = tbl.shape[-4], tbl.shape[-3]
    vals = _decode_mont_table(tbl)

    def proj_add(a, b):
        X1, Y1, Z1 = a
        X2, Y2, Z2 = b
        t0 = X1 * X2 % P
        t1 = Y1 * Y2 % P
        t2 = Z1 * Z2 % P
        t3 = ((X1 + Y1) * (X2 + Y2) - t0 - t1) % P
        t4 = ((Y1 + Z1) * (Y2 + Z2) - t1 - t2) % P
        y3 = ((X1 + Z1) * (X2 + Z2) - t0 - t2) % P
        x3 = 3 * t0 % P
        t2b = 9 * t2 % P
        z3 = (t1 + t2b) % P
        t1b = (t1 - t2b) % P
        y3b = 9 * y3 % P
        X3 = (t3 * t1b - t4 * y3b) % P
        Y3 = (t1b * z3 + y3b * x3) % P
        Z3 = (t4 * z3 + t3 * x3) % P
        return X3, Y3, Z3

    def proj_dbl(a):
        return proj_add(a, a)

    IDENT = (0, 1, 0)
    total = IDENT
    for w in range(W - 1, -1, -1):
        if total != IDENT:
            for _ in range(c):
                total = proj_dbl(total)
        run = IDENT
        acc = IDENT
        for b in range(B - 1, 0, -1):
            for d in range(D):
                i = ((d * W + w) * B + b) * 3
                pt = (vals[i], vals[i + 1], vals[i + 2])
                if pt[2] != 0:
                    run = proj_add(run, pt) if run != IDENT else pt
            if run != IDENT:
                acc = proj_add(acc, run) if acc != IDENT else run
        if acc != IDENT:
            total = proj_add(total, acc) if total != IDENT else acc
    if total == IDENT or total[2] == 0:
        return None
    zi = pow(total[2], -1, P)
    return (total[0] * zi % P, total[1] * zi % P)


def _pad_points_scalars(points, scalars_list):
    """Pad points to a lane multiple with copies of point 0 and each scalar
    column to the padded n with zeros (discarded bucket)."""
    n = points.shape[0]
    lane = SUB_T * 128
    npad = (-n) % lane
    if npad:
        pad_pt = jnp.broadcast_to(points[:1], (npad,) + points.shape[1:])
        points = jnp.concatenate([points, pad_pt])
        n += npad
    out = []
    for sl in scalars_list:
        pad = n - sl.shape[0]
        if pad:
            sl = jnp.concatenate([sl, jnp.zeros((pad, N_LIMBS), jnp.uint32)])
        out.append(sl)
    return points, out


def _host_fold_mont_shards(tbls: np.ndarray, c: int):
    """(D, W, B, 3, L) per-shard Montgomery bucket tables -> one affine
    point (bucket-wise shard sum folded into the standard window fold)."""
    return _host_fold_mont(tbls, c)


def msm_v2_host_batch(points_affine_mont, scalar_limbs_list, c: int | None = None,
                      interpret: bool = False):
    """C MSMs over SHARED points in one kernel chain + one small readback.
    Returns C host affine points (or None)."""
    c = MSM_C if c is None else c
    W, B = _wb(c)
    points, scalars = _pad_points_scalars(points_affine_mont, scalar_limbs_list)
    C = len(scalars)
    px, py = _msm_prep_points(points)
    digs_all, signs_all = [], []
    for sl in scalars:
        d, s = _msm_prep_digits(sl, c)
        digs_all.append(d)
        signs_all.append(s)
    digs = jnp.concatenate(digs_all, axis=0)    # (C*W, tiles, st, 128)
    signs = jnp.concatenate(signs_all, axis=0)
    lanes_tbl = _accum_v2(px, py, digs, signs, B, interpret)
    tbl = _lane_reduce_v2(lanes_tbl, interpret)  # (C*W, B, 3, L)
    tbl_h = np.asarray(tbl).reshape(C, W, B, 3, N_LIMBS)
    return [_host_fold_mont(t, c) for t in tbl_h]


def msm_v2_host(points_affine_mont, scalar_limbs, c: int | None = None,
                interpret: bool = False):
    return msm_v2_host_batch(points_affine_mont, [scalar_limbs], c, interpret)[0]


def _msm_tbl(points_affine_mont, scalar_limbs, interpret: bool = False):
    """Shared prep: pad, digit-decompose, run the kernel; returns the
    (W4, B4, 3, L) device bucket table."""
    n = points_affine_mont.shape[0]
    lane = SUB_T * 128
    npad = (-n) % lane
    if npad:
        pad_pt = jnp.broadcast_to(
            points_affine_mont[:1], (npad,) + points_affine_mont.shape[1:]
        )
        points_affine_mont = jnp.concatenate([points_affine_mont, pad_pt])
        scalar_limbs = jnp.concatenate(
            [scalar_limbs, jnp.zeros((npad, N_LIMBS), jnp.uint32)]
        )
        n += npad
    tiles = n // lane
    digs, signs = _signed_digits4(scalar_limbs)
    px = points_affine_mont[:, 0, :].T.reshape(N_LIMBS, tiles, SUB_T, 128)
    py = points_affine_mont[:, 1, :].T.reshape(N_LIMBS, tiles, SUB_T, 128)
    d4 = digs.reshape(W4, tiles, SUB_T, 128)
    s4 = signs.astype(jnp.uint32).reshape(W4, tiles, SUB_T, 128)
    return _msm_buckets(px, py, d4, s4, interpret)


@jax.jit
def _reduce_buckets(tbl: jnp.ndarray) -> ec.PointP:
    """(W4, B4, 3, L) lane-reduced buckets -> one projective point."""
    buckets = ec.PointP(tbl[:, :, 0], tbl[:, :, 1], tbl[:, :, 2])  # (W4, B4)

    bsum = ec.PointP(buckets.x[:, 1:], buckets.y[:, 1:], buckets.z[:, 1:])
    suffix = _hs_scan_points(bsum, reverse=True)
    total = _hs_scan_points(suffix)
    win = ec.PointP(total.x[:, -1], total.y[:, -1], total.z[:, -1])  # (W4,)

    def dbl_body(_, p):
        return ec.double(p)

    def fold(acc, i):
        acc = jax.lax.fori_loop(0, C4, dbl_body, acc)
        s = ec.PointP(win.x[i][None], win.y[i][None], win.z[i][None])
        accb = ec.PointP(acc.x[None], acc.y[None], acc.z[None])
        out = ec.add(accb, s)
        return ec.PointP(out.x[0], out.y[0], out.z[0]), None

    acc, _ = jax.lax.scan(fold, ec.identity(), jnp.arange(W4 - 1, -1, -1))
    return acc

"""Device fixed-base scalar multiplication: s_i * G for a vector of scalars.

Windowed table method, fully on device: the host precomputes the tiny
table[w][d] = d * 2^(c*w) * G (affine, Montgomery-encoded); a fused Pallas
kernel (grid = (windows, point-tiles), table resident in VMEM) folds each
lane's digit entry in with a complete mixed add per step — the same
playbook as ops/msm_tile.py's accumulate kernel. Zero digits keep the
accumulator via select, so zero scalars yield the (0, 0) identity encoding.
A final batched inversion normalizes projective -> affine in log depth.

The original composed-op lax.scan path (kept as the CPU/interpret
fallback, `_accumulate`) measured ~26 s per 2^18 chunk on the chip — XLA's
lowering of the (n, 16)-limb madd chain round-trips HBM per op and pads
the 16-limb minor axis to 128 lanes; the Pallas kernel does the whole
window walk in VMEM at full (8, 128) tile occupancy.

Used to synthesize SRS bases at production degrees (2^20) — the host
window walk (proof_system/kzg.py _batch_base_mul) is hours at that size,
and shipping a 2^20-point ceremony file host->device rides a ~14 MB/s
tunnel (~18 min); synthesizing on device moves only the 32-byte seed.
Capability anchor: the reference loads 2^26 ceremony params
(integration/tests/integration.rs:12-22); this is the test/bench stand-in
generator at real degrees.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import FQ_LIMB, N_LIMBS
from . import ec
from . import field_ops as fo

C_BITS = 4  # window width: 64 windows x 15 non-zero digits
WINDOWS = 256 // C_BITS


def _host_table(base_affine) -> np.ndarray:
    """(WINDOWS, 2^c, 2, L) Montgomery affine: table[w][d] = d*2^(cw)*G.
    Entry d=0 is a placeholder (never selected; masked by the digit test).
    """
    from ..curves.bn254_curve import G1

    rows = []
    p = base_affine
    for _ in range(WINDOWS):
        row = [p, p]  # d=0 placeholder (masked out by select), then d=1
        acc = p
        for _d in range(2, 1 << C_BITS):
            acc = G1.add(acc, p)
            row.append(acc)
        rows.append(row)
        for _ in range(C_BITS):
            p = G1.double(p)
    return np.stack([ec.encode_affine_mont(r) for r in rows])


# bounded per-base table cache (ADVICE round-2): each table is
# WINDOWS * 2^C_BITS * 2 * L u32s (~1 MiB at c=4); in practice only the
# G1 generator is ever used, but an adversarial caller cycling bases must
# not grow host memory without bound. FIFO eviction is fine — rebuilding
# a table is milliseconds.
_TABLES: dict = {}
_TABLES_MAX = 8


def _table_for(base_affine) -> jnp.ndarray:
    key = base_affine
    t = _TABLES.get(key)
    if t is None:
        if len(_TABLES) >= _TABLES_MAX:
            _TABLES.pop(next(iter(_TABLES)))
        t = jnp.asarray(_host_table(base_affine))
        _TABLES[key] = t
    return t


@jax.jit
def _digits(scalars_std: jnp.ndarray) -> jnp.ndarray:
    """(n, L) standard 16-bit limbs -> (WINDOWS, n) uint32 digits in
    [0, 2^c)."""
    per_limb = 16 // C_BITS
    cols = []
    for w in range(WINDOWS):
        limb = scalars_std[:, w // per_limb]
        sh = C_BITS * (w % per_limb)
        cols.append((limb >> sh) & ((1 << C_BITS) - 1))
    return jnp.stack(cols)


@jax.jit
def _accumulate(table: jnp.ndarray, digs: jnp.ndarray) -> ec.PointP:
    n = digs.shape[1]
    acc0 = ec.identity((n,))

    def body(acc, wd):
        tbl_w, d = wd  # (2^c, 2, L), (n,)
        # one-hot select of the digit's table row: XLA lowers jnp.take on
        # this shape to a serialized gather (measured 26 s per 2^18 chunk);
        # 15 vectorized selects against broadcast rows run at VPU speed
        qx = jnp.zeros((n, N_LIMBS), jnp.uint32)
        qy = jnp.zeros((n, N_LIMBS), jnp.uint32)
        for b in range(1, 1 << C_BITS):
            m = (d == jnp.uint32(b))[:, None]
            qx = jnp.where(m, tbl_w[b, 0][None, :], qx)
            qy = jnp.where(m, tbl_w[b, 1][None, :], qy)
        nxt = ec.madd(acc, qx, qy)
        return ec.select_point(d == 0, acc, nxt), None

    acc, _ = jax.lax.scan(body, acc0, (table, digs))
    return acc


def _fb_kernel(tbl_ref, d_ref, c_ref, o_ref, ax, ay, az, *, windows: int):
    """One window-step of the fixed-base walk on an (8, 128) point tile:
    one-hot select of the digit's table row + one complete mixed add into
    the VMEM accumulator. Grid (tiles, windows), windows innermost so the
    accumulator scratch persists across a tile's window walk."""
    from .msm_tile import _kl_madd, _kl_select

    w = pl.program_id(1)
    p = [c_ref[l, 0] for l in range(N_LIMBS)]
    b3 = [c_ref[l, 1] for l in range(N_LIMBS)]

    @pl.when(w == 0)
    def _init():
        ax[...] = jnp.zeros_like(ax)
        az[...] = jnp.zeros_like(az)
        for l in range(N_LIMBS):
            ay[l] = jnp.broadcast_to(c_ref[l, 2], ay.shape[1:])

    d = d_ref[0, 0]  # (8, 128) digits in [0, 2^C)
    qx = [jnp.zeros_like(d) for _ in range(N_LIMBS)]
    qy = [jnp.zeros_like(d) for _ in range(N_LIMBS)]
    for b in range(1, 1 << C_BITS):
        m = d == jnp.uint32(b)
        for l in range(N_LIMBS):
            qx[l] = jnp.where(m, tbl_ref[0, b, 0, l], qx[l])
            qy[l] = jnp.where(m, tbl_ref[0, b, 1, l], qy[l])

    X = [ax[l] for l in range(N_LIMBS)]
    Y = [ay[l] for l in range(N_LIMBS)]
    Z = [az[l] for l in range(N_LIMBS)]
    nx, ny, nz = _kl_madd(p, b3, X, Y, Z, qx, qy)
    keep = d == 0
    for l in range(N_LIMBS):
        ax[l] = jnp.where(keep, X[l], nx[l])
        ay[l] = jnp.where(keep, Y[l], ny[l])
        az[l] = jnp.where(keep, Z[l], nz[l])

    @pl.when(w == windows - 1)
    def _flush():
        for l in range(N_LIMBS):
            o_ref[0, 0, l] = ax[l]
            o_ref[0, 1, l] = ay[l]
            o_ref[0, 2, l] = az[l]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _accumulate_tile(table, digs, interpret: bool = False) -> ec.PointP:
    """Pallas window walk: table (W, 2^C, 2, L), digs (W, n) -> projective
    accumulator (n,) as PointP."""
    from .msm_tile import _consts

    W, n = digs.shape
    st, lanes = 8, 128
    tiles = n // (st * lanes)
    d4 = digs.reshape(W, tiles, st, lanes)
    out = pl.pallas_call(
        functools.partial(_fb_kernel, windows=W),
        out_shape=jax.ShapeDtypeStruct((tiles, 3, N_LIMBS, st, lanes), jnp.uint32),
        grid=(tiles, W),
        in_specs=[
            pl.BlockSpec((1, 1 << C_BITS, 2, N_LIMBS), lambda t, w: (w, 0, 0, 0)),
            pl.BlockSpec((1, 1, st, lanes), lambda t, w: (w, t, 0, 0)),
            pl.BlockSpec((N_LIMBS, 3), lambda t, w: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 3, N_LIMBS, st, lanes), lambda t, w: (t, 0, 0, 0, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((N_LIMBS, st, lanes), jnp.uint32),
            pltpu.VMEM((N_LIMBS, st, lanes), jnp.uint32),
            pltpu.VMEM((N_LIMBS, st, lanes), jnp.uint32),
        ],
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(table, d4, jnp.asarray(_consts()))
    # (tiles, 3, L, st, lanes) -> (n, L) per coordinate
    def coord(c):
        return out[:, c].transpose(0, 2, 3, 1).reshape(n, N_LIMBS)

    return ec.PointP(coord(0), coord(1), coord(2))


@jax.jit
def _normalize(p: ec.PointP):
    zinv = fo.batch_inv_mont(FQ_LIMB, p.z)
    x = fo.mont_mul(FQ_LIMB, p.x, zinv)
    y = fo.mont_mul(FQ_LIMB, p.y, zinv)
    return jnp.stack([x, y], axis=1)  # (n, 2, L) Montgomery affine


# max scalars per dispatch: one 2^20-wide program crashes the axon TPU
# worker outright ("kernel fault"; every size <= 2^19 is fine — bisected
# round 3), and equal-size chunks reuse one compiled executable anyway.
CHUNK = 1 << 18


def fixed_base_mul_dev(base_affine, scalars_std: jnp.ndarray) -> jnp.ndarray:
    """base_affine: host affine int pair; scalars_std: (n, L) standard-form
    limbs. Returns (n, 2, L) Montgomery affine points s_i * base.
    Dispatches in CHUNK-sized slices (see CHUNK note above); the last slice
    is zero-padded to keep a single compiled shape.

    A zero scalar yields the all-zero (0, 0) row: the accumulator stays the
    projective identity (z = 0) and batch_inv_mont maps z = 0 to 0, so
    x = y = 0 after normalization. That is exactly the identity encoding
    shared with ec.encode_affine_mont / kzg's point decoders (which map
    x == y == 0 back to None), so zero scalars are safe end-to-end
    (ADVICE round-2: the convention is now load-bearing and documented,
    not an unchecked precondition)."""
    table = _table_for(base_affine)
    n = scalars_std.shape[0]
    use_kernel = jax.default_backend() != "cpu"
    if use_kernel:
        lane = 8 * 128
        npad = (-n) % lane
        s = scalars_std
        if npad:  # zero scalars land on the (0, 0) identity encoding
            s = jnp.concatenate(
                [s, jnp.zeros((npad, s.shape[1]), s.dtype)]
            )
        return _normalize(_accumulate_tile(table, _digits(s)))[:n]
    if n <= CHUNK:
        return _normalize(_accumulate(table, _digits(scalars_std)))
    parts = []
    for i in range(0, n, CHUNK):
        sl = scalars_std[i : i + CHUNK]
        if sl.shape[0] < CHUNK:  # pad to the compiled shape; zeros -> (0,0)
            pad = jnp.zeros((CHUNK - sl.shape[0], sl.shape[1]), sl.dtype)
            sl = jnp.concatenate([sl, pad])
        parts.append(_normalize(_accumulate(table, _digits(sl))))
    return jnp.concatenate(parts)[:n]

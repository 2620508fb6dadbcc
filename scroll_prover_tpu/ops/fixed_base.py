"""Device fixed-base scalar multiplication: s_i * G for a vector of scalars.

Windowed table method, fully on device: the host precomputes the tiny
table[w][d] = d * 2^(c*w) * G (affine, Montgomery-encoded), and one
lax.scan over the 256/c windows gathers each lane's digit entry and folds
it in with a complete mixed add (identity-safe; zero digits keep the
accumulator via select). A final batched inversion normalizes projective
-> affine in log depth.

Used to synthesize SRS bases at production degrees (2^20) in seconds —
the host window walk (proof_system/kzg.py _batch_base_mul) is hours at
that size. Capability anchor: the reference loads 2^26 ceremony params
(integration/tests/integration.rs:12-22); this is the test/bench stand-in
generator at real degrees.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

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
        q = jnp.take(tbl_w, d, axis=0)  # (n, 2, L)
        nxt = ec.madd(acc, q[:, 0], q[:, 1])
        return ec.select_point(d == 0, acc, nxt), None

    acc, _ = jax.lax.scan(body, acc0, (table, digs))
    return acc


@jax.jit
def _normalize(p: ec.PointP):
    zinv = fo.batch_inv_mont(FQ_LIMB, p.z)
    x = fo.mont_mul(FQ_LIMB, p.x, zinv)
    y = fo.mont_mul(FQ_LIMB, p.y, zinv)
    return jnp.stack([x, y], axis=1)  # (n, 2, L) Montgomery affine


def fixed_base_mul_dev(base_affine, scalars_std: jnp.ndarray) -> jnp.ndarray:
    """base_affine: host affine int pair; scalars_std: (n, L) standard-form
    limbs. Returns (n, 2, L) Montgomery affine points s_i * base.

    A zero scalar yields the all-zero (0, 0) row: the accumulator stays the
    projective identity (z = 0) and batch_inv_mont maps z = 0 to 0, so
    x = y = 0 after normalization. That is exactly the identity encoding
    shared with ec.encode_affine_mont / kzg's point decoders (which map
    x == y == 0 back to None), so zero scalars are safe end-to-end
    (ADVICE round-2: the convention is now load-bearing and documented,
    not an unchecked precondition)."""
    table = _table_for(base_affine)
    return _normalize(_accumulate(table, _digits(scalars_std)))

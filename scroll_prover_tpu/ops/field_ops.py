"""Device (JAX/XLA/TPU) modular arithmetic on limb-plane field elements.

Field elements are uint32 arrays of shape (..., N_LIMBS) holding 16-bit limbs
(fields/limbs.py). All functions are shape-polymorphic over leading axes,
jit-safe, and exact in 32-bit integer arithmetic:

  * limb product bound:  (2^16-1)^2 = 2^32 - 2^17 + 1
  * CIOS inner step:     t_j + a_i*b_j + c  <=  2^32 - 1   (always fits uint32)

Multiplication uses CIOS Montgomery reduction (result < p when p < R/4, true
for BN254/BLS12-381 scalar fields), so a single conditional subtraction
suffices and every output is canonical.

This layer replaces the reference's CPU Montgomery arithmetic in the
halo2curves fork (SURVEY.md L0; reference consumes it via
integration/src/prove.rs:1). Designed VPU-first: the 16-wide limb axis lives
in minor-most lanes; elementwise field ops over n-element vectors map to
(n, 16) uint32 tiles.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.limbs import LIMB_BITS, LIMB_MASK, N_LIMBS, LimbField

U32 = jnp.uint32
_MASK = np.uint32(LIMB_MASK)
_SHIFT = LIMB_BITS


def _u32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=U32)


def zeros_like_limbs(shape) -> jnp.ndarray:
    return jnp.zeros((*shape, N_LIMBS), dtype=U32)


# --- raw (non-modular) limb add/sub with carry/borrow chains ----------------


def _add_raw(a, b):
    """Limbwise add with carry propagation. Returns (sum_limbs, carry_out).

    lax.scan over the limb axis: ONE traced body instead of 16 unrolled
    slice/stack steps — XLA CPU compile time of composed field ops was
    dominated by the unrolled chains (measured 27s -> 6s for a 12-mul
    2-add graph), with identical runtime."""
    am = jnp.moveaxis(a, -1, 0)
    bm = jnp.moveaxis(b, -1, 0)

    def body(c, ab):
        aj, bj = ab
        s = aj + bj + c  # <= 2*(2^16-1)+1 < 2^32
        return s >> _SHIFT, s & _MASK

    c, out = jax.lax.scan(body, jnp.zeros(a.shape[:-1], dtype=U32), (am, bm))
    return jnp.moveaxis(out, 0, -1), c


def _sub_raw(a, b):
    """Limbwise a - b with borrow. Returns (diff_limbs, borrow_out in {0,1})."""
    am = jnp.moveaxis(a, -1, 0)
    bm = jnp.moveaxis(b, -1, 0)

    def body(brw, ab):
        aj, bj = ab
        # uint32 wraparound; top bit set iff the true difference was
        # negative (operands < 2^16, borrow in {0,1})
        d = aj - bj - brw
        return d >> 31, d & _MASK

    brw, out = jax.lax.scan(body, jnp.zeros(a.shape[:-1], dtype=U32), (am, bm))
    return jnp.moveaxis(out, 0, -1), brw


def _p_const(f: LimbField) -> jnp.ndarray:
    return jnp.asarray(f.p_limbs, dtype=U32)


def _cond_sub_p(f: LimbField, t, extra):
    """Given t (..., N_LIMBS) plus an `extra` high limb (values in {0,1,2}),
    return t - p if t + extra*2^256 >= p else t. Assumes t+extra*R < 2p."""
    p = jnp.broadcast_to(_p_const(f), t.shape)
    d, brw = _sub_raw(t, p)
    # subtract succeeds (no net borrow) iff extra > 0 or brw == 0
    take_d = (extra > 0) | (brw == 0)
    return jnp.where(take_d[..., None], d, t)


# --- modular add / sub / neg -------------------------------------------------


@partial(jax.jit, static_argnums=0)
def add_mod(f: LimbField, a, b):
    """(a + b) mod p; inputs canonical (< p)."""
    s, carry = _add_raw(a, b)
    return _cond_sub_p(f, s, carry)


@partial(jax.jit, static_argnums=0)
def sub_mod(f: LimbField, a, b):
    """(a - b) mod p; inputs canonical."""
    d, brw = _sub_raw(a, b)
    p = jnp.broadcast_to(_p_const(f), d.shape)
    dp, _ = _add_raw(d, p)
    return jnp.where((brw > 0)[..., None], dp, d)


@partial(jax.jit, static_argnums=0)
def neg_mod(f: LimbField, a):
    """(-a) mod p; maps 0 -> 0."""
    p = jnp.broadcast_to(_p_const(f), a.shape)
    d, _ = _sub_raw(p, a)
    return jnp.where(is_zero(a)[..., None], a, d)


def is_zero(a):
    """True where the element is zero (canonical form assumed)."""
    return jnp.all(a == 0, axis=-1)


def eq(a, b):
    return jnp.all(a == b, axis=-1)


def select(mask, a, b):
    """Elementwise select: mask broadcast over limbs. mask shape = a.shape[:-1]."""
    return jnp.where(mask[..., None], a, b)


# --- Montgomery multiplication (CIOS) ----------------------------------------


@partial(jax.jit, static_argnums=0)
def mont_mul(f: LimbField, a, b):
    """Montgomery product: a*b*R^{-1} mod p, canonical output.

    Lazy-carry formulation, vectorized over the limb axis (compile-time and
    op-count friendly vs an unrolled CIOS):

      phase 1: T = a*b as 2*N_LIMBS lazy limbs — per i, the partial product
        a_i * b is split into lo/hi halves and accumulated WITHOUT carry
        propagation (each lazy limb is a sum of <= 64 16-bit values < 2^22,
        far from uint32 overflow).
      phase 2: word-by-word Montgomery reduction — at step i only position i
        is normalized (absorb running carry) to extract the exact low 16
        bits for m_i = t_i * n0inv mod 2^16; m_i * p is accumulated lazily.
      phase 3: one carry-propagation pass + conditional subtract.

    Result < 2p before the final subtract (p < R/4 holds for BN254 Fq/Fr).
    """
    a, b = jnp.broadcast_arrays(a, b)
    n0inv = np.uint32(f.n0inv)
    L = N_LIMBS
    # (..., 2L) lazy accumulator; b and p padded once for rolled accumulation
    pad = jnp.zeros((*a.shape[:-1], L), dtype=U32)
    b_wide = jnp.concatenate([b, pad], axis=-1)
    p_wide = jnp.broadcast_to(
        jnp.concatenate([jnp.asarray(f.p_limbs, dtype=U32), jnp.zeros(L, U32)]),
        b_wide.shape,
    )

    def mul_body(i, t):
        ai = jax.lax.dynamic_index_in_dim(a, i, axis=a.ndim - 1, keepdims=True)
        prod = ai * b_wide  # zeros beyond L keep the tail clean
        lo = prod & _MASK
        hi = prod >> _SHIFT
        return t + jnp.roll(lo, i, axis=-1) + jnp.roll(hi, i + 1, axis=-1)

    t = jax.lax.fori_loop(
        0, L, mul_body, jnp.zeros((*a.shape[:-1], 2 * L), dtype=U32)
    )

    def red_body(i, carry):
        t, c = carry
        ti = jax.lax.dynamic_index_in_dim(t, i, axis=-1, keepdims=True)
        ti = ti + c
        m = (ti * n0inv) & _MASK
        prod = m * p_wide  # lo/hi split keeps lazy limbs < 2^22 (no overflow)
        t = t + jnp.roll(prod & _MASK, i, axis=-1) + jnp.roll(prod >> _SHIFT, i + 1, axis=-1)
        # position i is now divisible by 2^16; its upper bits carry to i+1
        ti2 = jax.lax.dynamic_index_in_dim(t, i, axis=-1, keepdims=True) + c
        return t, ti2 >> _SHIFT

    t, c = jax.lax.fori_loop(
        0, L, red_body, (t, jnp.zeros((*a.shape[:-1], 1), dtype=U32))
    )

    # result = lazy limbs L..2L-1 plus the running carry at position L
    res = t[..., L:]
    res = res.at[..., 0].add(c[..., 0])
    # full carry propagation (scan — see _add_raw note)
    resm = jnp.moveaxis(res, -1, 0)

    def carry_body(cc, rj):
        s = rj + cc
        return s >> _SHIFT, s & _MASK

    cc, out = jax.lax.scan(
        carry_body, jnp.zeros(a.shape[:-1], dtype=U32), resm
    )
    res = jnp.moveaxis(out, 0, -1)
    return _cond_sub_p(f, res, cc)


def mont_sqr(f: LimbField, a):
    return mont_mul(f, a, a)


# above this row count, the composed-op CIOS compiles to a program whose
# buffer assignment exceeds HBM (at (2^23, 16) the while-loop state +
# dynamic rolls cost 16 GB against the 15.75 GB chip — round-3 prove20
# OOM); the tiled limb-major Pallas kernel (ntt_tile.lm_mul) is O(tile)
BIG_MUL_ROWS = int(1 << 22) + 1


def mont_mul_big(f: LimbField, a, b):
    """mont_mul that routes huge Fr arrays through the tiled Pallas
    elementwise kernel (transpose -> lm_mul -> transpose; each transpose is
    a linear-memory copy, vs the composed path's 32 live temporaries)."""
    from ..fields.limbs import FR_LIMB

    rows = int(np.prod(a.shape[:-1])) if a.ndim >= 2 else 0
    if (
        f is FR_LIMB
        and a.ndim >= 2
        and a.shape == b.shape
        and rows >= BIG_MUL_ROWS
        and jax.default_backend() != "cpu"
    ):
        from .ntt_tile import lm_mul

        flat_a = a.reshape(rows, N_LIMBS)
        flat_b = b.reshape(rows, N_LIMBS)
        return lm_mul(flat_a.T, flat_b.T).T.reshape(a.shape)
    return mont_mul(f, a, b)


def to_mont(f: LimbField, a):
    """Standard form -> Montgomery form: a*R mod p  (= montmul(a, R^2))."""
    r2 = jnp.asarray(f.r2_limbs, dtype=U32)
    return mont_mul(f, a, jnp.broadcast_to(r2, a.shape))


def from_mont(f: LimbField, a):
    """Montgomery form -> standard form: a*R^{-1} mod p (= montmul(a, 1))."""
    one = np.zeros(N_LIMBS, np.uint32)
    one[0] = 1
    return mont_mul(f, a, jnp.broadcast_to(jnp.asarray(one), a.shape))


def one_mont(f: LimbField, shape=()) -> jnp.ndarray:
    """Montgomery form of 1 (= R mod p), broadcast to shape (..., N_LIMBS)."""
    return jnp.broadcast_to(jnp.asarray(f.r_limbs, dtype=U32), (*shape, N_LIMBS))


# --- exponentiation / inversion ----------------------------------------------


def pow_mont(f: LimbField, a, e: int):
    """a^e (a in Montgomery form, small static exponent), unrolled."""
    assert 0 <= e < (1 << 24), "use pow_bits_mont for large exponents"
    if e == 0:
        return one_mont(f, a.shape[:-1])
    acc = a
    for bit in bin(e)[3:]:
        acc = mont_mul(f, acc, acc)
        if bit == "1":
            acc = mont_mul(f, acc, a)
    return acc


@partial(jax.jit, static_argnums=0)
def pow_bits_mont(f: LimbField, a, bits):
    """a^e for e given as a (256,) uint32 bit array, MSB first.

    Single traced square-and-multiply step scanned over the bits: keeps the
    compiled graph small (two mont_muls) regardless of exponent size.
    """
    acc0 = one_mont(f, a.shape[:-1])

    def body(acc, bit):
        sq = mont_mul(f, acc, acc)
        sqa = mont_mul(f, sq, a)
        return jnp.where(bit > 0, sqa, sq), None

    acc, _ = jax.lax.scan(body, acc0, bits)
    return acc


def _exp_bits(e: int) -> np.ndarray:
    return np.array([(e >> (255 - i)) & 1 for i in range(256)], dtype=np.uint32)


_INV_BITS_CACHE: dict[int, np.ndarray] = {}


def inv_mont(f: LimbField, a):
    """a^{-1} in Montgomery form via Fermat (a^(p-2)). inv(0) returns 0."""
    bits = _INV_BITS_CACHE.get(f.modulus)
    if bits is None:
        bits = _exp_bits(f.modulus - 2)
        _INV_BITS_CACHE[f.modulus] = bits
    return pow_bits_mont(f, a, jnp.asarray(bits))


@partial(jax.jit, static_argnums=0)
def batch_inv_mont(f: LimbField, a):
    """Batched inversion along axis 0: (n, N_LIMBS) -> (n, N_LIMBS).

    Montgomery's trick: prefix products (log-depth associative scan), one
    Fermat inversion, backward sweep. Zeros map to zero (like halo2's
    batch_invert, which treats zeros as ones and restores them).
    """
    assert a.ndim == 2, "batch_inv_mont expects (n, N_LIMBS)"
    z = is_zero(a)
    ones = one_mont(f, a.shape[:-1])
    a_safe = select(z, ones, a)
    # inv[i] = prefix_excl[i] * suffix_excl[i] * total^{-1}: two log-depth
    # associative scans + one Fermat inversion. (The earlier backward-sweep
    # lax.scan was O(n) *sequential* device steps — seconds at n=2^20.)
    mul = lambda x, y: mont_mul(f, x, y)
    pref = jax.lax.associative_scan(mul, a_safe, axis=0)
    suff = jax.lax.associative_scan(mul, a_safe, axis=0, reverse=True)
    total_inv = inv_mont(f, pref[-1])
    one_row = one_mont(f, (1,))
    pref_ex = jnp.concatenate([one_row, pref[:-1]], axis=0)
    suff_ex = jnp.concatenate([suff[1:], one_row], axis=0)
    invs = mul(mul(pref_ex, suff_ex), jnp.broadcast_to(total_inv, a.shape))
    return select(z, jnp.zeros_like(a), invs)


# --- misc ---------------------------------------------------------------------


def cmov(cond, a, b):
    return select(cond, a, b)


@partial(jax.jit, static_argnums=0)
def reduce_once(f: LimbField, a):
    """Reduce a value in [0, 2p) to canonical [0, p)."""
    return _cond_sub_p(f, a, jnp.zeros(a.shape[:-1], dtype=U32))


def rand_elements(f: LimbField, rng: np.random.Generator, n: int) -> np.ndarray:
    """Host helper: n uniform field elements as (n, N_LIMBS) uint32 (standard
    form, canonical)."""
    out = []
    for _ in range(n):
        x = int.from_bytes(rng.bytes(40), "little") % f.modulus
        out.append(x)
    from ..fields.limbs import ints_to_limbs

    return ints_to_limbs(out)


# --- packed residency (round 4) ---------------------------------------------
# Two 16-bit limbs per u32 word: halves the HBM footprint of every column
# the prover keeps resident (at k=20 the real super circuit holds ~200
# columns x 64 MB in unpacked form — over the 16 GB chip; packed residency
# + transient unpacking at each use fits). Pure elementwise shifts/masks —
# XLA fuses the unpack into the consuming kernel's first pass.


@jax.jit
def pack_limbs(a: jnp.ndarray) -> jnp.ndarray:
    """(..., 2L) uint32 16-bit limbs -> (..., L) packed words."""
    return a[..., 0::2] | (a[..., 1::2] << 16)


@jax.jit
def unpack_limbs(p: jnp.ndarray) -> jnp.ndarray:
    """(..., L) packed words -> (..., 2L) uint32 16-bit limbs."""
    lo = p & jnp.uint32(0xFFFF)
    hi = p >> 16
    return jnp.stack([lo, hi], axis=-1).reshape(p.shape[:-1] + (2 * p.shape[-1],))

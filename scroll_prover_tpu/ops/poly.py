"""Device polynomial primitives over Fr limb planes.

Everything is shape-static and log-depth (Hillis-Steele scans under
fori_loop with a single traced body — same compile-size discipline as
ops/msm.py). Polynomials are (n, N_LIMBS) uint32 Montgomery coefficient
vectors, ascending degree.

Replaces the polynomial utility layer of the reference's halo2_proofs fork
(SURVEY.md L1: quotient construction, eval phase).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..fields.limbs import N_LIMBS, LimbField
from . import field_ops as fo


def _hs_scan(f: LimbField, x, combine, reverse: bool = False):
    """Inclusive Hillis-Steele prefix scan with `combine` (add/mul)."""
    if reverse:
        return _hs_scan(f, x[::-1], combine)[::-1]
    n = x.shape[0]
    steps = max((n - 1).bit_length(), 1)
    pos = jnp.arange(n, dtype=jnp.uint32)
    neutral_mask = None

    def body(k, v):
        s = jnp.uint32(1) << k
        shifted = jnp.roll(v, s, axis=0)
        merged = combine(f, v, shifted)
        return fo.select(pos >= s, merged, v)

    return jax.lax.fori_loop(0, steps, body, x)


@partial(jax.jit, static_argnums=0)
def prefix_sum_mont(f: LimbField, x):
    return _hs_scan(f, x, fo.add_mod)


@partial(jax.jit, static_argnums=0)
def sum_mont(f: LimbField, x):
    """Total sum along axis 0 via a halving tree: (n, L) -> (L,).

    ~2 full passes over the data vs the Hillis-Steele scan's log2(n)
    full-width passes — the right shape when only the total is needed
    (e.g. polynomial evaluation, prover phase 5)."""
    n = x.shape[0]
    while n > 1:
        h = n // 2
        lo, hi = x[:h], x[h : 2 * h]
        rem = x[2 * h :]
        x = fo.add_mod(f, lo, hi)
        if rem.shape[0]:
            x = jnp.concatenate([x, rem])
        n = x.shape[0]
    return x[0]


@partial(jax.jit, static_argnums=0)
def eval_poly_with_powers(f: LimbField, coeffs, pw):
    """f(z) given a precomputed powers table pw[i] = z^i (both (n, L)
    Montgomery). Shares one powers table across the many openings at the
    same point instead of re-running a length-n prefix-product scan per
    evaluation (prover phase 5 cost at k=20, round-3 phase log)."""
    return sum_mont(f, fo.mont_mul(f, coeffs, pw[: coeffs.shape[0]]))


@partial(jax.jit, static_argnums=0)
def suffix_sum_mont(f: LimbField, x):
    return _hs_scan(f, x, fo.add_mod, reverse=True)


@partial(jax.jit, static_argnums=0)
def prefix_prod_mont(f: LimbField, x):
    return _hs_scan(f, x, fo.mont_mul)


@partial(jax.jit, static_argnums=(0, 2))
def powers_mont(f: LimbField, z, n: int):
    """[1, z, z^2, ..., z^(n-1)] from a single Montgomery element z: (L,)."""
    one = fo.one_mont(f)
    base = jnp.broadcast_to(z[None, :], (n, N_LIMBS))
    base = base.at[0].set(one)
    return prefix_prod_mont(f, base)


@partial(jax.jit, static_argnums=0)
def eval_poly_mont(f: LimbField, coeffs, z):
    """f(z) for coeffs (n, L), z (L,), all Montgomery. Returns (L,)."""
    pw = powers_mont(f, z, coeffs.shape[0])
    t = fo.mont_mul(f, coeffs, pw)
    return prefix_sum_mont(f, t)[-1]


@partial(jax.jit, static_argnums=0)
def kzg_quotient_mont(f: LimbField, coeffs, z):
    """q(X) = (f(X) - f(z)) / (X - z) as (n, L) (top coefficient zero).

    Parallel form: with t_j = f_j z^j,  q_i = z^{-(i+1)} * sum_{j>i} t_j —
    one powers table, one suffix sum, one scale. Requires z != 0 (Fiat-
    Shamir challenges are never 0 except with negligible probability).
    """
    n = coeffs.shape[0]
    pw = powers_mont(f, z, n)
    t = fo.mont_mul(f, coeffs, pw)
    s = suffix_sum_mont(f, t)
    s = jnp.roll(s, -1, axis=0).at[-1].set(0)  # S_i = sum_{j >= i+1} t_j
    zinv = fo.inv_mont(f, z)
    pw_inv = powers_mont(f, zinv, n)  # zinv^i
    q = fo.mont_mul(f, s, pw_inv)
    return fo.mont_mul(f, q, jnp.broadcast_to(zinv[None, :], q.shape))


@partial(jax.jit, static_argnums=0)
def axpy_mont(f: LimbField, a, x, y):
    """a*x + y for scalar a (L,), vectors x, y (n, L)."""
    return fo.add_mod(f, fo.mont_mul(f, jnp.broadcast_to(a[None, :], x.shape), x), y)


def powers_outer_mont(f: LimbField, base: int, count: int):
    """(count, L) Montgomery table t[i] = base^i, built as a hi (x) lo outer
    product: two HOST-built factor tables of ~sqrt(count) entries and ONE
    device mul. A length-count prefix-product scan compiled past HBM at
    2^23 (docs/PERF.md round 3); this stays O(sqrt) host work + one pass."""
    from ..fields.limbs import ints_to_limbs

    p = f.modulus
    r = (1 << 256) % p
    nl = 1 << ((count - 1).bit_length() // 2) if count > 1 else 1
    nl = min(nl, count)
    nh = (count + nl - 1) // nl
    lo_ints, acc = [], 1
    w = base % p
    for _ in range(nl):
        lo_ints.append(acc * r % p)
        acc = acc * w % p
    w_nl = pow(w, nl, p)
    hi_ints, acc = [], 1
    for _ in range(nh):
        hi_ints.append(acc * r % p)
        acc = acc * w_nl % p
    lo_m = jnp.asarray(ints_to_limbs(lo_ints))
    hi_m = jnp.asarray(ints_to_limbs(hi_ints))
    out = fo.mont_mul(
        f,
        jnp.broadcast_to(hi_m[:, None, :], (nh, nl, N_LIMBS)),
        jnp.broadcast_to(lo_m[None, :, :], (nh, nl, N_LIMBS)),
    ).reshape(nh * nl, N_LIMBS)
    return out[:count]

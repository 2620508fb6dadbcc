"""Device limb-plane field arithmetic vs the host Python-int reference.

Tier-1 unit tests (SURVEY.md section 4 rebuild implication: kernel-level field
op tests against reference values).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from scroll_prover_tpu.fields.bn254 import FQ_MOD, FR_MOD
from scroll_prover_tpu.fields.limbs import (
    FQ_LIMB,
    FR_LIMB,
    N_LIMBS,
    int_to_limbs,
    ints_to_limbs,
    limbs_to_int,
    limbs_to_ints,
)
from scroll_prover_tpu.ops import field_ops as fo

FIELDS = [FQ_LIMB, FR_LIMB]


def _rand_ints(rng, f, n):
    return [int.from_bytes(rng.bytes(40), "little") % f.modulus for _ in range(n)]


def test_limb_codec_roundtrip(rng):
    xs = _rand_ints(rng, FQ_LIMB, 17) + [0, 1, FQ_MOD - 1]
    arr = ints_to_limbs(xs)
    assert arr.shape == (len(xs), N_LIMBS)
    assert limbs_to_ints(arr) == xs
    assert limbs_to_int(int_to_limbs(xs[0])) == xs[0]


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_add_sub_neg(rng, f):
    n = 64
    a = _rand_ints(rng, f, n)
    b = _rand_ints(rng, f, n)
    a[0], b[0] = 0, 0
    a[1], b[1] = f.modulus - 1, f.modulus - 1
    A, B = jnp.asarray(ints_to_limbs(a)), jnp.asarray(ints_to_limbs(b))
    s = limbs_to_ints(np.asarray(fo.add_mod(f, A, B)))
    d = limbs_to_ints(np.asarray(fo.sub_mod(f, A, B)))
    ng = limbs_to_ints(np.asarray(fo.neg_mod(f, A)))
    for i in range(n):
        assert s[i] == (a[i] + b[i]) % f.modulus
        assert d[i] == (a[i] - b[i]) % f.modulus
        assert ng[i] == (-a[i]) % f.modulus


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_mont_mul(rng, f):
    n = 64
    a = _rand_ints(rng, f, n)
    b = _rand_ints(rng, f, n)
    a[0], b[1] = 0, 0
    a[2], b[2] = f.modulus - 1, f.modulus - 1
    a[3], b[3] = 1, 1
    A = jnp.asarray(f.encode(a))  # Montgomery form
    B = jnp.asarray(f.encode(b))
    got = f.decode(np.asarray(fo.mont_mul(f, A, B)))
    for i in range(n):
        assert got[i] == a[i] * b[i] % f.modulus, i


@pytest.mark.parametrize("f", FIELDS, ids=lambda f: f.name)
def test_mont_roundtrip(rng, f):
    a = _rand_ints(rng, f, 16)
    A = jnp.asarray(ints_to_limbs(a))  # standard form
    m = fo.to_mont(f, A)
    assert limbs_to_ints(np.asarray(m)) == [x * (1 << 256) % f.modulus for x in a]
    back = fo.from_mont(f, m)
    assert limbs_to_ints(np.asarray(back)) == a


def test_pow_and_inv(rng):
    f = FR_LIMB
    a = _rand_ints(rng, f, 8)
    A = jnp.asarray(f.encode(a))
    sq = f.decode(np.asarray(fo.pow_mont(f, A, 2)))
    assert sq == [x * x % f.modulus for x in a]
    inv = f.decode(np.asarray(fo.inv_mont(f, A)))
    assert inv == [pow(x, -1, f.modulus) for x in a]


def test_batch_inv(rng):
    f = FR_LIMB
    a = _rand_ints(rng, f, 33)
    a[5] = 0  # zero should map to zero
    A = jnp.asarray(f.encode(a))
    inv = f.decode(np.asarray(fo.batch_inv_mont(f, A)))
    for i, x in enumerate(a):
        assert inv[i] == (pow(x, -1, f.modulus) if x else 0), i


def test_is_zero_eq_select(rng):
    f = FR_LIMB
    a = [0, 5, 0, 7]
    A = jnp.asarray(ints_to_limbs(a))
    assert list(np.asarray(fo.is_zero(A))) == [True, False, True, False]
    m = fo.select(jnp.asarray([True, False, True, False]), A, jnp.zeros_like(A))
    assert limbs_to_ints(np.asarray(m)) == [0, 0, 0, 0]

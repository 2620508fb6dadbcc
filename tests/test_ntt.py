"""NTT engine vs naive host DFT (tier-1 kernel tests, SURVEY.md section 4)."""
import numpy as np
import jax.numpy as jnp
import pytest

from scroll_prover_tpu.fields.bn254 import FR_MOD
from scroll_prover_tpu.fields.limbs import FR_LIMB
from scroll_prover_tpu.ops.ntt import EvaluationDomain


def _rand_poly(rng, n):
    return [int.from_bytes(rng.bytes(40), "little") % FR_MOD for _ in range(n)]


def _naive_dft(coeffs, omega, p):
    n = len(coeffs)
    pw = [pow(omega, i, p) for i in range(n)]
    return [
        sum(coeffs[i] * pw[(i * k) % n] for i in range(n)) % p for k in range(n)
    ]


@pytest.mark.parametrize("k", [3, 6, 10])
def test_ntt_matches_naive(rng, k):
    d = EvaluationDomain(k)
    coeffs = _rand_poly(rng, d.n)
    x = jnp.asarray(FR_LIMB.encode(coeffs))
    got = FR_LIMB.decode(np.asarray(d.ntt(x)))
    want = _naive_dft(coeffs, d.omega, FR_MOD)
    assert got == want


@pytest.mark.parametrize("k", [4, 8])
def test_intt_roundtrip(rng, k):
    d = EvaluationDomain(k)
    coeffs = _rand_poly(rng, d.n)
    x = jnp.asarray(FR_LIMB.encode(coeffs))
    back = FR_LIMB.decode(np.asarray(d.intt(d.ntt(x))))
    assert back == coeffs


def test_extended_coset_roundtrip_and_eval(rng):
    d = EvaluationDomain(4, j=2)
    coeffs = _rand_poly(rng, d.n) + [0] * (d.extended_n - d.n)
    x = jnp.asarray(FR_LIMB.encode(coeffs))
    evals = d.ntt_extended(x)
    # spot-check: evaluation at coset point zeta * w_ext^3
    pt = d.g_coset * pow(d.extended_omega, 3, FR_MOD) % FR_MOD
    want = sum(c * pow(pt, i, FR_MOD) for i, c in enumerate(coeffs)) % FR_MOD
    got = FR_LIMB.decode(np.asarray(evals))[3]
    assert got == want
    back = FR_LIMB.decode(np.asarray(d.intt_extended(evals)))
    assert back == coeffs


def test_polynomial_multiplication_via_ntt(rng):
    # convolution check: (a*b) via extended-domain pointwise product
    from scroll_prover_tpu.ops import field_ops as fo

    d = EvaluationDomain(4, j=1)
    na = d.n
    a = _rand_poly(rng, na // 2)
    b = _rand_poly(rng, na // 2)
    pad = lambda c: c + [0] * (d.extended_n - len(c))
    A = jnp.asarray(FR_LIMB.encode(pad(a)))
    B = jnp.asarray(FR_LIMB.encode(pad(b)))
    prod_evals = fo.mont_mul(FR_LIMB, d.ntt_extended(A), d.ntt_extended(B))
    prod = FR_LIMB.decode(np.asarray(d.intt_extended(prod_evals)))
    want = [0] * d.extended_n
    for i, ai in enumerate(a):
        for j_, bj in enumerate(b):
            want[i + j_] = (want[i + j_] + ai * bj) % FR_MOD
    assert prod == want


def test_batch_transforms_match_per_column(rng):
    from scroll_prover_tpu.ops import field_ops as fo

    d = EvaluationDomain(5, j=1)
    cols = [_rand_poly(rng, d.n) for _ in range(3)]
    x = jnp.asarray(np.stack([FR_LIMB.encode(c) for c in cols]))
    xb = d.ntt_batch(x)
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(xb[c]), np.asarray(d.ntt(x[c])))
    back = d.intt_batch(xb)
    for c in range(3):
        assert FR_LIMB.decode(np.asarray(back[c])) == cols[c]
    # extended coset batch
    pad = jnp.zeros((3, d.extended_n - d.n, x.shape[-1]), jnp.uint32)
    xe = jnp.concatenate([x, pad], axis=1)
    eb = d.ntt_extended_batch(xe)
    for c in range(3):
        np.testing.assert_array_equal(
            np.asarray(eb[c]), np.asarray(d.ntt_extended(xe[c]))
        )
    backe = d.intt_extended_batch(eb)
    for c in range(3):
        np.testing.assert_array_equal(np.asarray(backe[c]), np.asarray(xe[c]))

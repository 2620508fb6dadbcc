"""KZG: SRS generation/io, device commit/open vs host, pairing verification."""
import numpy as np
import jax.numpy as jnp
import pytest

from scroll_prover_tpu.curves.bn254_curve import G1, g1_generator
from scroll_prover_tpu.fields.bn254 import FR_MOD
from scroll_prover_tpu.fields.limbs import FR_LIMB
from scroll_prover_tpu.proof_system import kzg
from scroll_prover_tpu.ops import poly as poly_ops
from scroll_prover_tpu.ops import field_ops as fo

K = 5


@pytest.fixture(scope="module")
def srs():
    return kzg.SRS.generate(K)


def _poly_mont(coeffs):
    return jnp.asarray(FR_LIMB.encode(coeffs, mont=True))


def test_srs_roundtrip(tmp_path, srs):
    p = tmp_path / "params5"
    srs.save(str(p))
    s2 = kzg.SRS.load(str(p))
    assert s2.k == srs.k
    assert s2.g1_powers == srs.g1_powers
    assert s2.g1_lagrange == srs.g1_lagrange
    assert s2.g2 == srs.g2 and s2.s_g2 == srs.s_g2


def test_commit_matches_host(srs, rng):
    coeffs = [int(rng.integers(0, 2**62)) for _ in range(1 << K)]
    com = kzg.kzg_commit(srs, _poly_mont(coeffs))
    want = kzg._host_msm(srs.g1_powers, coeffs)
    assert com == want


def test_lagrange_commit_equals_monomial(srs, rng):
    # committing evals in Lagrange basis == committing coeffs in monomial
    from scroll_prover_tpu.ops.ntt import EvaluationDomain

    coeffs = [int.from_bytes(rng.bytes(40),'little') % FR_MOD for _ in range(1 << K)]
    dom = EvaluationDomain(K)
    evals = dom.ntt(_poly_mont(coeffs))
    c1 = kzg.kzg_commit(srs, _poly_mont(coeffs), basis="monomial")
    c2 = kzg.kzg_commit(srs, evals, basis="lagrange")
    assert c1 == c2


def test_open_verifies(srs, rng):
    coeffs = [int.from_bytes(rng.bytes(40),'little') % FR_MOD for _ in range(1 << K)]
    pm = _poly_mont(coeffs)
    com = kzg.kzg_commit(srs, pm)
    z = (int.from_bytes(rng.bytes(40),'little') % (FR_MOD-1)) + 1
    val, wit = kzg.kzg_open(srs, pm, z)
    want = sum(c * pow(z, i, FR_MOD) for i, c in enumerate(coeffs)) % FR_MOD
    assert val == want
    assert kzg.verify_single_open(srs, com, z, val, wit)
    # wrong value must fail
    assert not kzg.verify_single_open(srs, com, z, (val + 1) % FR_MOD, wit)


def test_poly_ops_basics(rng):
    f = FR_LIMB
    coeffs = [3, 2, 1, 7]
    pm = _poly_mont(coeffs)
    z = 5
    zm = jnp.asarray(f.encode([z])[0])
    ev = poly_ops.eval_poly_mont(f, pm, zm)
    got = f.decode(np.asarray(ev)[None, :])[0]
    assert got == (3 + 2 * z + z * z + 7 * z**3) % FR_MOD
    pw = poly_ops.powers_mont(f, zm, 6)
    assert f.decode(np.asarray(pw)) == [pow(z, i, FR_MOD) for i in range(6)]


def test_generate_fast_matches_host_generate():
    # device-path SRS synthesis (ops/fixed_base.py) must be bit-identical
    # to the host window walk — it feeds the k=20 bench prover
    from scroll_prover_tpu.proof_system.kzg import _SRS_CACHE

    seed = b"fixed-base-parity"
    a = kzg.SRS.generate(5, seed=seed)
    _SRS_CACHE.pop((5, seed))
    b = kzg.SRS.generate_fast(5, seed=seed)
    assert a.g1_powers == b.g1_powers
    assert a.g1_lagrange == b.g1_lagrange
    assert (a.g2, a.s_g2) == (b.g2, b.s_g2)

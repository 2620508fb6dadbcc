"""PLONK backend end-to-end: mock prove, real prove, verify, tamper cases."""
import numpy as np
import pytest

from scroll_prover_tpu.fields.bn254 import FR_MOD
from scroll_prover_tpu.proof_system import kzg
from scroll_prover_tpu.proof_system.plonk import Circuit, ConstraintSystem, MockProver
from scroll_prover_tpu.proof_system.plonk.cs import empty_assignment
from scroll_prover_tpu.proof_system.plonk.keygen import keygen
from scroll_prover_tpu.proof_system.plonk.prover import prove
from scroll_prover_tpu.proof_system.plonk.verifier import verify

K = 6
N_COMP = 8  # computation rows


class MulCircuit(Circuit):
    """c = a*b rows, a-values range-checked via lookup, pi[0] copied to a[0].

    Exercises: a degree-3 gate, a lookup, copy constraints across advice and
    instance columns, multi-chunk permutation argument.
    """

    def __init__(self, bad_gate=False, bad_lookup=False, bad_copy=False):
        self.bad_gate = bad_gate
        self.bad_lookup = bad_lookup
        self.bad_copy = bad_copy

    def configure(self, cs: ConstraintSystem):
        self.a = cs.advice_column()
        self.b = cs.advice_column()
        self.c = cs.advice_column()
        self.sel = cs.selector()
        self.tbl = cs.fixed_column()
        self.pi = cs.instance_column()
        cs.gate(
            "mul",
            self.sel.query() * (self.a.query() * self.b.query() - self.c.query()),
        )
        cs.lookup("a_range", [self.sel.query() * self.a.query()], [self.tbl.query()])

    def assign(self, cs: ConstraintSystem, n: int, instance):
        fixed = empty_assignment(cs.num_fixed, n)
        advice = empty_assignment(cs.num_advice, n)
        pi0 = int(instance[self.pi.index][0])
        for i in range(N_COMP):
            a = pi0 + i
            b = i + 5
            if self.bad_gate and i == 3:
                b += 1
                advice[self.c.index][i] = (pi0 + 3) * 8 % FR_MOD
                advice[self.a.index][i] = a
                advice[self.b.index][i] = b
                fixed[self.sel.index][i] = 1
                continue
            advice[self.a.index][i] = a
            advice[self.b.index][i] = b
            advice[self.c.index][i] = a * b % FR_MOD
            fixed[self.sel.index][i] = 1
        # lookup table: fixed range 0..40 (independent of the instance —
        # fixed columns are committed at keygen with a zero instance)
        vals = list(range(41))
        if self.bad_lookup:
            vals.remove(9)  # pi0=7 -> a[2]=9 falls out of the table
        for i, v in enumerate(vals):
            fixed[self.tbl.index][i] = v
        # copies: pi[0] == a[0]; c[0] == c[0] self-copy (idempotent — the
        # constraint system dedupes exact duplicates across keygen/prove)
        cs.copy(self.pi, 0, self.a, 0)
        cs.copy(self.c, 0, self.c, 0)
        if self.bad_copy:
            advice[self.a.index][0] = (pi0 + 1) % FR_MOD
            advice[self.c.index][0] = (pi0 + 1) * 5 % FR_MOD
        return {"fixed": fixed, "advice": advice}


@pytest.fixture(scope="module")
def srs():
    return kzg.SRS.generate(K)


def _instance():
    return [[7]]


def test_mock_satisfied():
    MockProver.run(K, MulCircuit(), _instance()).assert_satisfied()


def test_mock_catches_gate():
    fails = MockProver.run(K, MulCircuit(bad_gate=True), _instance()).verify()
    assert any(f.kind == "gate" for f in fails)


def test_mock_catches_lookup():
    fails = MockProver.run(K, MulCircuit(bad_lookup=True), _instance()).verify()
    assert any(f.kind == "lookup" for f in fails)


def test_mock_catches_copy():
    fails = MockProver.run(K, MulCircuit(bad_copy=True), _instance()).verify()
    assert any(f.kind == "copy" for f in fails)


def test_prove_verify(srs):
    circuit = MulCircuit()
    pk, vk = keygen(srs, K, circuit)
    proof = prove(srs, pk, circuit, _instance())
    assert verify(srs, vk, _instance(), proof)


def test_verify_rejects_wrong_instance(srs):
    circuit = MulCircuit()
    pk, vk = keygen(srs, K, circuit)
    proof = prove(srs, pk, circuit, _instance())
    assert not verify(srs, vk, [[8]], proof)


def test_verify_rejects_tampered_proof(srs):
    circuit = MulCircuit()
    pk, vk = keygen(srs, K, circuit)
    proof = bytearray(prove(srs, pk, circuit, _instance()))
    proof[70] ^= 1
    try:
        ok = verify(srs, vk, _instance(), bytes(proof))
    except AssertionError:
        ok = False
    assert not ok


def test_copy_registration_is_idempotent():
    """Exact-duplicate copy constraints are deduped (keygen's sigma splice
    would be UNDONE by a repeated transposition); assign() may therefore
    re-register data-dependent copies on every call."""
    from scroll_prover_tpu.proof_system.plonk.keygen import _build_next

    cs = ConstraintSystem()
    a = cs.advice_column()
    b = cs.advice_column()
    cs.copy(a, 0, b, 3)
    once = _build_next(cs, 8).copy()
    cs.copy(a, 0, b, 3)  # e.g. assign() running again at prove time
    assert len(cs.copies) == 1
    assert (_build_next(cs, 8) == once).all()


def test_zero_scalar_fixed_base_is_identity_encoding():
    """fixed_base_mul_dev maps zero scalars to the (0,0) row — the identity
    encoding shared with ec.encode_affine_mont (ADVICE round-2)."""
    import jax.numpy as jnp
    import numpy as np

    from scroll_prover_tpu.curves.bn254_curve import g1_generator
    from scroll_prover_tpu.fields.limbs import FQ_LIMB, ints_to_limbs, limbs_to_ints
    from scroll_prover_tpu.ops import field_ops as fo
    from scroll_prover_tpu.ops.fixed_base import fixed_base_mul_dev

    g = g1_generator()
    out = fixed_base_mul_dev(g, jnp.asarray(ints_to_limbs([0, 1])))
    flat = limbs_to_ints(np.asarray(fo.from_mont(FQ_LIMB, out.reshape(4, -1))))
    assert (flat[0], flat[1]) == (0, 0)
    assert (flat[2], flat[3]) == g


def test_streamed_quotient_matches_full(srs, monkeypatch):
    """The coset-streaming quotient driver (device path for ext_n >= 2^22,
    prover.py _quotient_cosets) is bit-equivalent to the full-domain driver:
    same seed -> byte-identical proof. SPT_FORCE_STREAM=1 exercises it on
    the CPU backend at test scale."""
    circuit = MulCircuit()
    pk, vk = keygen(srs, K, circuit)
    seed = b"\x07" * 32
    base = prove(srs, pk, circuit, _instance(), seed=seed)
    monkeypatch.setenv("SPT_FORCE_STREAM", "1")
    streamed = prove(srs, pk, circuit, _instance(), seed=seed)
    assert streamed == base
    assert verify(srs, vk, _instance(), streamed)

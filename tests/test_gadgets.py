"""Gadget layer tests: builder arithmetic, range checks, non-native Fq,
EC point ops — MockProver-checked at small k (the reference's halo2-lib
gadget surface, SURVEY.md section 2.2 halo2-base/halo2-ecc row)."""
import pytest

from scroll_prover_tpu.fields.bn254 import FQ_MOD, FR_MOD
from scroll_prover_tpu.gadgets.builder import Builder
from scroll_prover_tpu.proof_system.plonk import Circuit, ConstraintSystem, MockProver
from scroll_prover_tpu.proof_system.plonk.cs import empty_assignment

K = 11
LOOKUP_BITS = 10


class _Harness(Circuit):
    """Runs a gadget program through the builder; optional tamper hook."""

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
        self.program(b, self)
        if self.tamper:
            self.tamper(b, adv)
        return {"fixed": fixed, "advice": adv}


def _check(program, tamper=None, expect_ok=True):
    circ = _Harness(program, tamper)
    mp = MockProver.run(K, circ, [[]])
    failures = mp.verify()
    if expect_ok:
        assert failures == [], [str(f) for f in failures[:5]]
    else:
        assert failures, "expected constraint failure, got none"


def test_arith_ops():
    def prog(b, h):
        a = b.const(7)
        c = b.const(9)
        s = b.add(a, c)
        assert s.val == 16
        m = b.mul(s, a)
        assert m.val == 112
        d = b.sub(m, c)
        assert d.val == 103
        acc = b.lin([(2, a), (3, c), (5, m)], 11)
        assert acc.val == (2 * 7 + 3 * 9 + 5 * 112 + 11) % FR_MOD
        b.assert_lin_zero([(1, acc), (-1, acc)])
        z = b.is_zero(b.sub(a, a))
        assert z.val == 1
        nz = b.is_zero(a)
        assert nz.val == 0
        dot = b.dot_acc([(a, c), (s, m), (d, d)], init=a)
        assert dot.val == (7 + 7 * 9 + 16 * 112 + 103 * 103) % FR_MOD

    _check(prog)


def test_select_and_bits():
    def prog(b, h):
        one = b.assert_bit(b.witness(1))
        zero = b.assert_bit(b.witness(0))
        a = b.const(1234)
        c = b.const(77)
        assert b.select(one, a, c).val == 1234
        assert b.select(zero, a, c).val == 77
        v = b.const(0b1011001)
        bits = b.decompose_bits(v, 7)
        assert [x.val for x in bits] == [1, 0, 0, 1, 1, 0, 1]

    _check(prog)


def test_bad_bit_rejected():
    def prog(b, h):
        b.witness(2)

    def tamper(b, adv):
        # boolean-constrain the first witness cell post-hoc via qbool row
        r = b.row
        b.fixed[b.qbool[0].index][r] = 1
        adv[b.w[0][0].index][r] = 2
        b._op += b.lanes

    _check(prog, tamper, expect_ok=False)


def test_range_check():
    def prog(b, h):
        b.range_check(b.const(1023), 10)
        b.range_check(b.const((1 << 30) - 3), 30)
        b.range_check(b.const(0), 10)
        b.range_check(b.const(5), 3)  # top-chunk shift path

    _check(prog)


def test_range_check_violation():
    def prog(b, h):
        c = b.witness(1 << 12)  # too big for 10 bits
        # manual bad decomposition: claim chunks that don't recompose
        try:
            b.range_check(c, 10)
        except AssertionError:
            # witness-side guard fired; force the bad chunk row instead
            (cc,) = b.range_row([(1 << 10) - 1])
            b.assert_lin_zero([(1, cc), (-1, cc)])

    # a chunk value >= 2^lookup_bits must be caught by the lookup
    def prog2(b, h):
        r = b.row0 + b._lkslot // b.n_lookup
        b.adv[b.lk[b._lkslot % b.n_lookup].index][r] = 1 << LOOKUP_BITS
        b.fixed[b.q_lk[b._lkslot % b.n_lookup].index][r] = 1
        b._lkslot += 1

    _check(prog2, expect_ok=False)


def test_tampered_mul_rejected():
    def prog(b, h):
        a = b.const(3)
        c = b.const(5)
        b.mul(a, c)

    circ = _Harness(prog)
    mp = MockProver.run(K, circ, [[]])
    assert mp.verify() == []
    # flip the product output cell (mul output lives in w4 of its row, on
    # whichever lane the round-robin dealt the op to)
    done = False
    for lane in range(circ.b.lanes):
        col = mp.advice[circ.b.w[lane][4].index]
        for r in range(mp.n):
            if col[r] == 15:
                col[r] = 16
                done = True
                break
        if done:
            break
    assert done and mp.verify(), "tampered product must fail a gate"

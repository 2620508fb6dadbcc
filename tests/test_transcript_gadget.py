"""In-circuit Poseidon transcript vs the host transcript: identical
challenge streams, fully constrained (gadgets/transcript.py). Capability
anchor: snark-verifier's in-circuit transcript (SURVEY.md section 2.2)."""
import pytest

from scroll_prover_tpu.curves.bn254_curve import G1, g1_generator
from scroll_prover_tpu.fields.bn254 import FR_MOD
from scroll_prover_tpu.gadgets.builder import Builder
from scroll_prover_tpu.gadgets.ecc import EccChip
from scroll_prover_tpu.gadgets.nonnative import NonNativeChip
from scroll_prover_tpu.gadgets.transcript import InCircuitTranscript
from scroll_prover_tpu.proof_system.plonk import Circuit, ConstraintSystem, MockProver
from scroll_prover_tpu.proof_system.plonk.cs import empty_assignment
from scroll_prover_tpu.proof_system.transcript import PoseidonTranscript
from scroll_prover_tpu.zkevm.subcircuits import PoseidonSubCircuit

G = g1_generator()
P2 = G1.mul(G, 424242)

# a scripted proof blob: two scalars and one point
_W = PoseidonTranscript()
_W.write_scalar(12345)
_W.write_point(P2)
_W.write_scalar(67890)
PROOF = _W.finalize()


def host_stream():
    tr = PoseidonTranscript(PROOF)
    tr.common_scalar(7)  # preamble
    s1 = tr.read_scalar()
    c1 = tr.squeeze_challenge()
    p = tr.read_point()
    c2 = tr.squeeze_challenge()
    s2 = tr.read_scalar()
    c3 = tr.squeeze_challenge()
    return s1, c1, p, c2, s2, c3


class _Circ(Circuit):
    def __init__(self):
        self.got = {}

    def configure(self, cs: ConstraintSystem):
        self.instance = cs.instance_column()
        cs.enable_permutation(self.instance)
        self.b = Builder().configure(cs, lookup_bits=11)
        self.pos = PoseidonSubCircuit().configure(cs)
        cs.enable_permutation(self.pos.s[0])
        cs.enable_permutation(self.pos.elem[0])
        cs.enable_permutation(self.pos.elem[1])

    def assign(self, cs, n, instance):
        fixed = empty_assignment(cs.num_fixed, n)
        adv = empty_assignment(cs.num_advice, n)
        b = self.b.begin(cs, fixed, adv, n, 0)
        ec = EccChip(NonNativeChip(b))
        tr = InCircuitTranscript(b, self.pos, PROOF)
        tr.common_scalar_const(7)
        s1 = tr.read_scalar()
        c1 = tr.squeeze()
        p = tr.read_point(ec)
        c2 = tr.squeeze()
        s2 = tr.read_scalar()
        c3 = tr.squeeze()
        # use a challenge cell in builder arithmetic (copy across regions)
        prod = b.mul(c1, s1)
        self.got.update(
            s1=s1.val, c1=c1.val, p=p.value, c2=c2.val, s2=s2.val, c3=c3.val,
            prod=prod.val,
        )
        assert tr.rows_used() < n - 8
        return {"fixed": fixed, "advice": adv}


def test_matches_host_and_constrained():
    s1, c1, p, c2, s2, c3 = host_stream()
    circ = _Circ()
    mp = MockProver.run(12, circ, [[]])
    assert circ.got["s1"] == s1
    assert circ.got["c1"] == c1
    assert circ.got["p"] == p
    assert circ.got["c2"] == c2
    assert circ.got["s2"] == s2
    assert circ.got["c3"] == c3
    assert circ.got["prod"] == c1 * s1 % FR_MOD
    failures = mp.verify()
    assert failures == [], [str(f) for f in failures[:5]]


def test_tampered_state_rejected():
    circ = _Circ()
    mp = MockProver.run(12, circ, [[]])
    assert mp.verify() == []
    # flip a poseidon state cell mid-permutation
    col = mp.advice[circ.pos.s[0].index]
    for r in range(5, mp.n):
        if col[r] != 0:
            col[r] = (col[r] + 1) % FR_MOD
            break
    assert mp.verify(), "tampered sponge state must fail"

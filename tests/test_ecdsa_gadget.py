"""In-circuit ECDSA gadget (gadgets/ecdsa.py) over secp256k1.

Fast tier: counting-mode program build on a REAL fixture signature (witness
asserts inside the gadget cross-check every intermediate against the host),
plus witness-level rejection of a tampered signature. Slow tier: full
MockProver satisfaction + tamper rejection at the real domain (~295k rows,
k=19) — the reference sig-circuit scale (SURVEY.md section 2.2)."""
import os

import pytest

from scroll_prover_tpu.curves import secp256k1 as secp
from scroll_prover_tpu.gadgets.builder import Builder
from scroll_prover_tpu.gadgets.ecdsa import EcdsaChip
from scroll_prover_tpu.hashes.keccak import keccak256
from scroll_prover_tpu.proof_system.plonk import Circuit, ConstraintSystem, MockProver
from scroll_prover_tpu.proof_system.plonk.cs import empty_assignment
from scroll_prover_tpu.prover.verifier_circuit import _SinkCols

M128 = (1 << 128) - 1


def _sig(msg=b"spt-ecdsa", d=0x5EED5EED5EED, k=0x1337133713371337):
    z = int.from_bytes(keccak256(msg), "big") % secp.N
    r = secp.mul(secp.G, k)[0] % secp.N
    s = pow(k, -1, secp.N) * (z + r * d) % secp.N
    return z, r, s, secp.mul(secp.G, d)


def _program(b, z, r, s, q):
    chip = EcdsaChip(b)
    zc = chip.load_u256(b.witness(z >> 128), b.witness(z & M128))
    rc = chip.load_u256(b.witness(r >> 128), b.witness(r & M128))
    sc = chip.load_u256(b.witness(s >> 128), b.witness(s & M128))
    chip.verify(zc, rc, sc, q)


def _counting_run(z, r, s, q):
    cs = ConstraintSystem()
    bld = Builder().configure(cs, lookup_bits=11)
    b = bld.begin(cs, _SinkCols(), _SinkCols(), 1 << 30, 0)
    _program(b, z, r, s, q)
    return b.rows_used()


def test_gadget_builds_and_matches_host():
    z, r, s, q = _sig()
    assert secp.ecdsa_verify(z, r, s, q)
    rows = _counting_run(z, r, s, q)
    lanes = max(int(os.environ.get("SPT_BUILDER_LANES", "1")), 1)
    assert rows * lanes > 100_000  # real ECDSA scale (ops, lane-normalized)


def test_fixture_signature_builds():
    fixture = "/root/reference/integration/tests/extra_traces/batch_300/chunk_12263"
    if not os.path.isdir(fixture):
        pytest.skip("reference fixtures not mounted")
    from scroll_prover_tpu.utils import load_chunk
    from scroll_prover_tpu.witness.sig import tx_sig_event

    tx = next(
        t for tr in load_chunk(fixture) for t in tr.transactions if not t.is_l1_msg
    )
    ev = tx_sig_event(tx)
    _counting_run(ev.msg_hash % secp.N, ev.r, ev.s, ev.pubkey)


def test_tampered_signature_rejected_at_witness():
    z, r, s, q = _sig()
    # witness generation itself must refuse an invalid signature: the
    # x_R == r + f*n integer identity fails inside _assert_limbs_zero
    with pytest.raises(AssertionError):
        _counting_run(z, r, s + 2, q)


def test_sig_subcircuit_cap_path_builds():
    fixture = "/root/reference/integration/tests/extra_traces/batch_300/chunk_12263"
    if not os.path.isdir(fixture):
        pytest.skip("reference fixtures not mounted")
    from scroll_prover_tpu.utils import load_chunk
    from scroll_prover_tpu.witness.block import chunk_trace_to_witness_block
    from scroll_prover_tpu.zkevm.subcircuits import SigSubCircuit

    wb = chunk_trace_to_witness_block(load_chunk(fixture))
    cs = ConstraintSystem()
    sc = SigSubCircuit().configure(cs, cap=1)
    rows = sc.assign(cs, _SinkCols(), _SinkCols(), 1 << 30, wb, 0)
    assert rows == len(wb.sig_events()) > 0
    lanes = max(int(os.environ.get("SPT_BUILDER_LANES", "1")), 1)
    assert sc._builder_rows * lanes > 100_000  # the in-circuit ECDSA ran
    assert sc._builder_rows < SigSubCircuit.rows_per_verify()  # min_k budget holds


class _Harness(Circuit):
    def __init__(self, z, r, s, q, tamper=None):
        self.args = (z, r, s, q)
        self.tamper = tamper

    def configure(self, cs: ConstraintSystem):
        self.instance = cs.instance_column()
        cs.enable_permutation(self.instance)
        self.b = Builder().configure(cs, lookup_bits=11)

    def assign(self, cs, n, instance):
        fixed = empty_assignment(cs.num_fixed, n)
        adv = empty_assignment(cs.num_advice, n)
        b = self.b.begin(cs, fixed, adv, n, 0)
        _program(b, *self.args)
        if self.tamper:
            self.tamper(self.b, adv)
        return {"fixed": fixed, "advice": adv}


@pytest.mark.slow
def test_ecdsa_mock_prove_full():
    z, r, s, q = _sig()
    circ = _Harness(z, r, s, q)
    mp = MockProver.run(19, circ, [[]])
    failures = mp.verify()
    assert failures == [], [str(f) for f in failures[:5]]
    # flip one advice bit -> some constraint must break
    col = circ.b.w[0][0].index
    mp.advice[col][5] = (int(mp.advice[col][5]) + 1) % secp.N
    assert mp.verify(), "tampered ECDSA witness must be rejected"

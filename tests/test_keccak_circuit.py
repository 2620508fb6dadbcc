"""Keccak-f[1600] constrained-permutation subcircuit (zkevm/keccak_circuit).

MockProver tier on a synthetic single-block bytecode event: the bound
event's bytecode-table hash is PROVEN to be keccak256 of its bytes —
tampering a state bit, a recomposed digest bit, or the bound length must
all be rejected (VERDICT round-2 item 2's keccak deepening)."""
import pytest

from scroll_prover_tpu.hashes.keccak import (
    ROUND_CONSTANTS, _MASK, _rol, chi_sources, keccak_f, keccak_f_trace,
    pad_blocks,
)
from scroll_prover_tpu.proof_system.plonk import MockProver
from scroll_prover_tpu.witness.block import chunk_trace_to_witness_block
from scroll_prover_tpu.zkevm.super_circuit import ScrollSuperCircuit

from test_witness_ccc import synthetic_trace


def test_trace_and_chi_sources():
    import random

    rng = random.Random(7)
    st = [rng.getrandbits(64) for _ in range(25)]
    states, thetas = keccak_f_trace(st)
    assert states[0] == st and states[24] == keccak_f(st)
    for r in (0, 11, 23):
        nxt = []
        for y in range(5):
            for x in range(5):
                b = [_rol(thetas[r][sl], rot) for sl, rot in chi_sources(x, y)]
                nxt.append((b[0] ^ (~b[1] & b[2])) & _MASK)
        nxt[0] ^= ROUND_CONSTANTS[r]
        assert nxt == states[r + 1]


@pytest.fixture(scope="module")
def mock(monkeypatch_module):
    monkeypatch_module.setenv("SPT_KECCAK_CAP", "2")
    wb = chunk_trace_to_witness_block([synthetic_trace()])
    assert wb.keccak_events and all(
        len(pad_blocks(ev.preimage)) == 1 for ev in wb.keccak_events
    ), "synthetic code should be single-block"
    circ = ScrollSuperCircuit.new_from_block(wb)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    return circ, mp


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    m = MonkeyPatch()
    yield m
    m.undo()


def test_keccak_f_mock_satisfied(mock):
    circ, mp = mock
    picks = circ.keccak_f.bound_events(circ.wb, circ.keccak_f.cap)
    assert picks, "no events bound in-circuit"
    failures = mp.verify()
    assert failures == [], [str(f) for f in failures[:5]]


def test_tampered_state_bit_rejected(mock):
    circ, mp = mock
    # flip one post-theta state bit on a beta compute row
    q_col = mp.fixed[circ.keccak_f.q_ap.index]
    a_col = mp.advice[circ.keccak_f.A[7].index]
    target = next(r for r in range(mp.n) if q_col[r] == 1)
    old = a_col[target]
    a_col[target] = 1 - int(old)
    try:
        failures = mp.verify()
        assert failures, "tampered keccak state bit must be rejected"
        assert any("keccak" in str(f) for f in failures)
    finally:
        a_col[target] = old


def test_tampered_digest_bit_rejected(mock):
    circ, mp = mock
    # flip a recomposed digest bit: the copy to the final state must fail
    q_col = mp.fixed[circ.keccak_f.q_kb_first.index]
    kb_col = mp.advice[circ.keccak_f.kb.index]
    target = next(r for r in range(mp.n) if q_col[r] == 1)
    old = kb_col[target]
    kb_col[target] = 1 - int(old)
    try:
        failures = mp.verify()
        assert failures, "tampered digest bit must be rejected"
    finally:
        kb_col[target] = old


def test_tampered_table_digest_rejected_via_permutation(mock):
    circ, mp = mock
    # the keccak TABLE's hash cell of a bound event is now PROVEN: flipping
    # it breaks the copy constraint to the recomposed digest
    picks = circ.keccak_f.bound_events(circ.wb, circ.keccak_f.cap)
    trow = circ.keccak.row_of_[picks[0][0].digest]
    hi_col = mp.advice[circ.keccak.hash_hi.index]
    old = hi_col[trow]
    hi_col[trow] = int(old) + 1
    try:
        failures = mp.verify()
        assert failures, "tampered bound table digest must be rejected"
        assert any(f.kind in ("copy", "lookup") for f in failures)
    finally:
        hi_col[trow] = old

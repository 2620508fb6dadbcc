"""Sha256SubCircuit: fully-constrained SHA-256 compression with the event
table's digest proven (halo2_gadgets sha256 scope)."""
import hashlib

import pytest

from scroll_prover_tpu.proof_system.plonk import MockProver
from scroll_prover_tpu.witness.block import chunk_trace_to_witness_block
from scroll_prover_tpu.zkevm.super_circuit import ScrollSuperCircuit

from test_witness_ccc import synthetic_trace


def _mk(monkeypatch_module, msgs):
    monkeypatch_module.setenv("SPT_SHA256_CAP", "4")
    wb = chunk_trace_to_witness_block([synthetic_trace()])
    for m in msgs:
        wb.sha256_raw.append((m, hashlib.sha256(m).digest()))
        wb.sha256_bytes += len(m)
    circ = ScrollSuperCircuit.new_from_block(wb)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    return circ, mp


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    m = MonkeyPatch()
    yield m
    m.undo()


@pytest.fixture(scope="module")
def mock(monkeypatch_module):
    # one single-block and one two-block message (chained compression)
    return _mk(monkeypatch_module, [b"abc", b"spt" * 30])


def test_sha256_mock_satisfied(mock):
    circ, mp = mock
    assert len(circ.sha256.picks(circ.wb, circ.sha256.cap)) == 2
    failures = mp.verify()
    assert failures == [], [str(f) for f in failures[:5]]


def test_tampered_state_bit_rejected(mock):
    circ, mp = mock
    q_col = mp.fixed[circ.sha256.q_rword.index]
    a_col = mp.advice[circ.sha256.A.index]
    target = next(r for r in range(mp.n) if q_col[r] == 1)
    old = a_col[target]
    a_col[target] = 1 - int(old)
    try:
        failures = mp.verify()
        assert failures, "tampered sha256 state bit must be rejected"
        assert any("sha" in str(f) for f in failures)
    finally:
        a_col[target] = old


def test_tampered_table_digest_rejected(mock):
    import hashlib as _h

    circ, mp = mock
    q_col = mp.fixed[circ.sha256.q.index]
    hi_col = mp.advice[circ.sha256.d_hi.index]
    # tamper a BOUND event's table row (the synthetic trace adds unbound
    # sha256 events of its own)
    want_hi = int.from_bytes(_h.sha256(b"abc").digest()[:16], "big")
    target = next(
        r for r in range(mp.n) if q_col[r] == 1 and int(hi_col[r]) == want_hi
    )
    old = hi_col[target]
    hi_col[target] = int(old) + 1
    try:
        failures = mp.verify()
        assert failures, "tampered bound sha256 digest must be rejected"
        assert any(f.kind == "copy" or "sha" in str(f) for f in failures)
    finally:
        hi_col[target] = old


def test_tampered_length_rejected(mock):
    circ, mp = mock
    q_col = mp.fixed[circ.sha256.q_lenw.index]
    len_col = mp.advice[circ.sha256.len_col.index]
    target = next(r for r in range(mp.n) if q_col[r] == 1)
    old = len_col[target]
    len_col[target] = int(old) + 1
    try:
        failures = mp.verify()
        assert failures, "tampered bound message length must be rejected"
    finally:
        len_col[target] = old

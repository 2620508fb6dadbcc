"""EccSubCircuit: BN254 precompile events with real operands verified
in-circuit (ecadd fast tier; ecmul at ECDSA scale in the slow tier)."""
import pytest

from scroll_prover_tpu.curves.bn254_curve import G1, g1_generator
from scroll_prover_tpu.proof_system.plonk import MockProver
from scroll_prover_tpu.witness.block import EccEvent, chunk_trace_to_witness_block
from scroll_prover_tpu.zkevm.super_circuit import ScrollSuperCircuit

from test_witness_ccc import synthetic_trace


def _w(v: int) -> bytes:
    return v.to_bytes(32, "big")


def _add_event():
    g = g1_generator()
    q = G1.mul(g, 7)
    r = G1.add(g, q)
    return EccEvent("ecadd", _w(g[0]) + _w(g[1]) + _w(q[0]) + _w(q[1]),
                    _w(r[0]) + _w(r[1]))


def _mul_event(k=0x1234567890ABCDEF1234567890ABCDEF):
    g = g1_generator()
    p = G1.mul(g, 3)
    r = G1.mul(p, k)
    return EccEvent("ecmul", _w(p[0]) + _w(p[1]) + _w(k), _w(r[0]) + _w(r[1]))


@pytest.fixture(scope="module")
def mock():
    wb = chunk_trace_to_witness_block([synthetic_trace()])
    wb.ecc_events.append(_add_event())
    # a double: P + P (the chip must take the doubling formula)
    g = g1_generator()
    d = G1.add(g, g)
    wb.ecc_events.append(
        EccEvent("ecadd", _w(g[0]) + _w(g[1]) + _w(g[0]) + _w(g[1]),
                 _w(d[0]) + _w(d[1]))
    )
    circ = ScrollSuperCircuit.new_from_block(wb)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    return circ, mp


def test_ecadd_mock_satisfied(mock):
    circ, mp = mock
    assert len(circ.ecc.picks(circ.wb)) == 2
    failures = mp.verify()
    assert failures == [], [str(f) for f in failures[:5]]


def test_tampered_result_rejected(mock):
    circ, mp = mock
    # flip the bound result word: the copy into the gadget must fail
    q_col = mp.fixed[circ.ecc.q.index]
    slot_col = mp.advice[circ.ecc.slot.index]
    vlo = mp.advice[circ.ecc.v_lo.index]
    target = next(
        r for r in range(mp.n) if q_col[r] == 1 and slot_col[r] == 4
    )
    old = vlo[target]
    vlo[target] = int(old) + 1
    try:
        failures = mp.verify()
        assert failures, "tampered ecadd result must be rejected"
    finally:
        vlo[target] = old


@pytest.mark.slow
def test_ecmul_mock_full():
    wb = chunk_trace_to_witness_block([synthetic_trace()])
    wb.ecc_events.append(_mul_event())
    circ = ScrollSuperCircuit.new_from_block(wb)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    failures = mp.verify()
    assert failures == [], [str(f) for f in failures[:5]]


def test_unverifiable_events_skipped():
    wb = chunk_trace_to_witness_block([synthetic_trace()])
    # identity operand and a wrong-result event must be excluded (table-only)
    wb.ecc_events.append(EccEvent("ecadd", b"\x00" * 128, b"\x00" * 64))
    g = g1_generator()
    wb.ecc_events.append(
        EccEvent("ecadd", _w(g[0]) + _w(g[1]) + _w(g[0]) + _w(g[1]),
                 _w(g[0]) + _w(g[1]))
    )
    wb.ecc_events.append(EccEvent("ecpairing", b"\x01" * 192, b"\x00" * 32))
    from scroll_prover_tpu.zkevm.subcircuits import EccSubCircuit

    sc = EccSubCircuit()
    sc.cap = 4
    assert sc.picks(wb) == []
    # the table still carries every event's words
    table_rows, _ = sc.rows_for(wb, cap=0)
    assert table_rows > 0

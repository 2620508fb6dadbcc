"""ModExpSubCircuit: modexp precompile events verified in-circuit by
non-native square-and-multiply over the event's own modulus (reference
misc-precompiled-circuit scope)."""
import pytest

from scroll_prover_tpu.proof_system.plonk import MockProver
from scroll_prover_tpu.witness.block import chunk_trace_to_witness_block
from scroll_prover_tpu.zkevm.super_circuit import ScrollSuperCircuit

from test_witness_ccc import synthetic_trace

M = (1 << 255) - 19  # a 255-bit prime modulus
B_VAL = 0x1234567890ABCDEF1234567890ABCDEF
E_VAL = 0x10001


def _event(b=B_VAL, e=E_VAL, m=M, r=None):
    r = pow(b, e, m) if r is None else r
    inp = (32).to_bytes(32, "big") * 3 + b.to_bytes(32, "big") \
        + e.to_bytes(32, "big") + m.to_bytes(32, "big")
    return (inp, r.to_bytes(32, "big"))


@pytest.fixture(scope="module")
def mock():
    wb = chunk_trace_to_witness_block([synthetic_trace()])
    wb.modexp_raw.append(_event())
    wb.modexp_events += 1
    circ = ScrollSuperCircuit.new_from_block(wb)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    return circ, mp


def test_modexp_mock_satisfied(mock):
    circ, mp = mock
    assert len(circ.mod_exp.picks(circ.wb)) == 1
    failures = mp.verify()
    assert failures == [], [str(f) for f in failures[:5]]


def test_tampered_modexp_result_rejected(mock):
    circ, mp = mock
    q_col = mp.fixed[circ.mod_exp.q.index]
    slot_col = mp.advice[circ.mod_exp.slot.index]
    vlo = mp.advice[circ.mod_exp.v_lo.index]
    target = next(
        r for r in range(mp.n) if q_col[r] == 1 and slot_col[r] == 3
    )
    old = vlo[target]
    vlo[target] = int(old) + 1
    try:
        failures = mp.verify()
        assert failures, "tampered modexp result must be rejected"
    finally:
        vlo[target] = old


def test_bad_or_oversize_events_skipped():
    from scroll_prover_tpu.zkevm.subcircuits import ModExpSubCircuit

    wb = chunk_trace_to_witness_block([synthetic_trace()])
    wb.modexp_raw.append(_event(r=12345))  # wrong result
    wb.modexp_raw.append(_event(m=1 << 64))  # modulus below the floor
    sc = ModExpSubCircuit()
    sc.cap = 4
    assert sc.picks(wb) == []

"""RlpSubCircuit: constrained structural parsing of real signing payloads
with the calldata length bound to the tx table."""
import os

import pytest

from scroll_prover_tpu.proof_system.plonk import MockProver
from scroll_prover_tpu.utils import load_chunk
from scroll_prover_tpu.witness.block import chunk_trace_to_witness_block
from scroll_prover_tpu.zkevm.super_circuit import ScrollSuperCircuit

REF_CHUNK = "/root/reference/integration/tests/extra_traces/batch_300/chunk_12263"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CHUNK), reason="reference fixtures not mounted"
)


@pytest.fixture(scope="module")
def mock():
    wb = chunk_trace_to_witness_block(load_chunk(REF_CHUNK))
    circ = ScrollSuperCircuit.new_from_block(wb)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    return circ, mp


def test_rlp_events_cover_fixture_txs(mock):
    circ, _mp = mock
    events = circ.rlp.events(circ.wb)
    assert events, "fixture has legacy txs"
    # payloads are real RLP lists with a long-form outer header somewhere
    assert any(p[0] >= 0xF8 for _i, p in events)


def test_rlp_mock_satisfied(mock):
    circ, mp = mock
    assert circ.row_usages_["rlp"] > 100
    failures = mp.verify()
    assert failures == [], [str(f) for f in failures[:5]]


def test_corrupted_length_byte_rejected(mock):
    circ, mp = mock
    # raise a short-string header's declared length by one: the item
    # stream desynchronizes and a structural gate or the end-of-event
    # boundary must fail
    q_col = mp.fixed[circ.rlp.q_body.index]
    ph_col = mp.advice[circ.rlp.ph.index]
    cm_col = mp.advice[circ.rlp.cm.index]
    byte_col = mp.advice[circ.rlp.byte.index]
    target = next(
        r for r in range(mp.n)
        if q_col[r] == 1 and ph_col[r] == 1 and cm_col[r] == 1
        and int(byte_col[r]) > 0x80
    )
    old = byte_col[target]
    byte_col[target] = int(old) + 1
    try:
        failures = mp.verify()
        assert failures, "corrupted RLP length byte must be rejected"
        assert any("rlp" in str(f) for f in failures)
    finally:
        byte_col[target] = old


def test_calldata_length_binding(mock):
    circ, mp = mock
    # tamper the parsed calldata length on a completion row of item 6:
    # the (tx_id, data_len) lookup into the tx table must fail
    look_col = mp.advice[circ.rlp.look.index]
    ilen_col = mp.advice[circ.rlp.ilen.index]
    target = next(
        (r for r in range(mp.n) if look_col[r] == 1 and int(ilen_col[r]) > 0),
        None,
    )
    if target is None:
        pytest.skip("no nonempty calldata item completed with look=1")
    old = ilen_col[target]
    ilen_col[target] = int(old) + 1
    try:
        failures = mp.verify()
        assert failures, "tampered calldata length must be rejected"
    finally:
        ilen_col[target] = old

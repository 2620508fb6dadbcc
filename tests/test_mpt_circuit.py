"""MPT subcircuit: fully-constrained storage inclusion proofs on a REAL
reference fixture with storage accesses (batch_300/chunk_12263).

Covers: host witness roundtrip (path-compressed trie proofs), MockProver
satisfaction with a live mpt region, and rejection of a tampered sibling
hash and a tampered bound storage value (VERDICT component row
'halo2-mpt-circuits').
"""
import os

import pytest

from scroll_prover_tpu.fields.bn254 import FR_MOD
from scroll_prover_tpu.proof_system.plonk import MockProver
from scroll_prover_tpu.utils import load_chunk
from scroll_prover_tpu.witness.block import TAG_STORAGE, chunk_trace_to_witness_block
from scroll_prover_tpu.witness.mpt import storage_mpt_witness
from scroll_prover_tpu.zkevm.super_circuit import ScrollSuperCircuit

REF_CHUNK = "/root/reference/integration/tests/extra_traces/batch_300/chunk_12263"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CHUNK), reason="reference fixtures not mounted"
)


@pytest.fixture(scope="module")
def wb():
    return chunk_trace_to_witness_block(load_chunk(REF_CHUNK))


@pytest.fixture(scope="module")
def mock(wb):
    circ = ScrollSuperCircuit.new_from_block(wb)
    mp = MockProver.run(circ.min_k(), circ, circ.instance_for())
    return circ, mp


def test_mpt_witness_roundtrip(wb):
    from scroll_prover_tpu.trie import verify_merkle_proof

    assert any(r.tag == TAG_STORAGE for r in wb.rw_rows)
    root, events = storage_mpt_witness(wb)
    assert events, "fixture must yield storage inclusion proofs"
    for ev in events:
        assert verify_merkle_proof(root, ev.key, ev.value_hash, ev.siblings)
    # with >1 slot the compressed trie has real internal levels
    assert any(ev.siblings for ev in events)


def test_mpt_mock_satisfied(mock):
    circ, mp = mock
    assert circ.row_usages_["mpt"] > 0
    failures = mp.verify()
    assert failures == [], [str(f) for f in failures[:5]]


def test_tampered_sibling_rejected(mock):
    circ, mp = mock
    q_col = mp.fixed[circ.mpt.q.index]
    sib_col = mp.advice[circ.mpt.sib.index]
    target = next(r for r in range(mp.n) if q_col[r] == 1)
    old = sib_col[target]
    sib_col[target] = (int(old) + 1) % FR_MOD
    try:
        failures = mp.verify()
        assert failures, "tampered sibling must be rejected"
        assert any("mpt" in str(f) or "copy" in str(f) for f in failures)
    finally:
        sib_col[target] = old


def test_tampered_storage_value_rejected(mock):
    circ, mp = mock
    q_col = mp.fixed[circ.mpt.q_hdr.index]
    v_col = mp.advice[circ.mpt.v_lo.index]
    target = next(r for r in range(mp.n) if q_col[r] == 1)
    old = v_col[target]
    v_col[target] = (int(old) + 1) % FR_MOD
    try:
        failures = mp.verify()
        assert failures, "tampered bound storage value must be rejected"
    finally:
        v_col[target] = old

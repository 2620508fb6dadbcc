"""zkEVM subcircuit semantics on the REAL reference fixture
(/root/reference/integration/tests/extra_traces/batch_3/chunk_10):

VERDICT round-2 item 4 'Done' criteria — MockProver must reject
  (a) a witness with a flipped bytecode byte (evm<->bytecode lookup), and
  (b) a stale state read (rw-table read-consistency gate)
on fixture-derived witnesses. Plus positive checks: real code bytes in the
bytecode table, real keccak digests (trace keccakCodeHash equality), and
real rw values chaining across the chunk's transactions.
"""
import os

import pytest

from scroll_prover_tpu.fields.bn254 import FR_MOD
from scroll_prover_tpu.hashes.keccak import keccak256
from scroll_prover_tpu.proof_system.plonk import MockProver
from scroll_prover_tpu.utils import load_chunk
from scroll_prover_tpu.witness.block import TAG_BALANCE, chunk_trace_to_witness_block
from scroll_prover_tpu.zkevm.super_circuit import ScrollSuperCircuit

REF_CHUNK = "/root/reference/integration/tests/extra_traces/batch_3/chunk_10"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_CHUNK), reason="reference fixtures not mounted"
)


@pytest.fixture(scope="module")
def wb():
    # two blocks keep the MockProver domain small while still exercising
    # cross-tx rw chaining (the coinbase balance changes every block)
    traces = load_chunk(REF_CHUNK)[:2]
    return chunk_trace_to_witness_block(traces)


@pytest.fixture(scope="module")
def mock(wb):
    circ = ScrollSuperCircuit.new_from_block(wb)
    k = circ.min_k()
    mp = MockProver.run(k, circ, circ.instance_for())
    return circ, mp


def test_witness_has_real_tables(wb):
    assert wb.bytecode_map, "no real bytecode extracted"
    for h, code in wb.bytecode_map.items():
        assert keccak256(code).hex() == h  # real bytes under the real hash
    assert wb.keccak_events
    for ev in wb.keccak_events:
        assert keccak256(ev.preimage) == ev.digest
    assert wb.rw_rows
    assert any(r.is_write for r in wb.rw_rows)
    assert any(not r.is_write for r in wb.rw_rows)
    # cross-tx chaining: at least one key group has multiple rows
    from collections import Counter

    groups = Counter((r.tag, r.addr, r.key) for r in wb.rw_rows)
    assert max(groups.values()) >= 2


def test_fixture_mock_prove_satisfied(mock):
    _circ, mp = mock
    failures = mp.verify()
    assert failures == [], [str(f) for f in failures[:5]]


def test_flipped_bytecode_byte_rejected(mock, wb):
    circ, mp = mock
    col = mp.advice[circ.bytecode.byte.index]
    # flip a byte that some executed step actually looked up: row of the
    # bytecode region holding (code, pc) of the first top-frame step
    step = next(s for s in wb.steps if s.code_hash)
    target = None
    hi_col = mp.advice[circ.bytecode.hash_hi.index]
    idx_col = mp.advice[circ.bytecode.index.index]
    want_hi = step.code_hash >> 128
    for r in range(mp.n):
        if hi_col[r] == want_hi and idx_col[r] == step.pc:
            target = r
            break
    assert target is not None
    old = col[target]
    col[target] = (old + 1) % 256
    try:
        failures = mp.verify()
        assert failures, "flipped bytecode byte must be rejected"
        assert any("bytecode" in str(f) or "lookup" in str(f) for f in failures)
    finally:
        col[target] = old


def test_stale_state_read_rejected(mock, wb):
    circ, mp = mock
    # find an assigned read row whose key group has a previous row (same==1)
    same_col = mp.advice[circ.state.same.index]
    isw_col = mp.advice[circ.state.is_write.index]
    vlo_col = mp.advice[circ.state.v_lo.index]
    target = None
    for r in range(mp.n):
        if same_col[r] == 1 and isw_col[r] == 0:
            target = r
            break
    assert target is not None, "no chained read row found"
    old = vlo_col[target]
    vlo_col[target] = (int(old) + 1) % FR_MOD
    try:
        failures = mp.verify()
        assert failures, "stale state read must be rejected"
        assert any("state/read_consistent" in str(f) for f in failures)
    finally:
        vlo_col[target] = old


def test_tampered_copied_byte_rejected(mock):
    circ, mp = mock
    # flip a transported byte on a CODE-sourced copy row: the copy->bytecode
    # lookup must fail (the copy circuit moves the REAL code bytes)
    q_col = mp.fixed[circ.copy.q_code.index]
    byte_col = mp.advice[circ.copy.byte.index]
    target = next(r for r in range(mp.n) if q_col[r] == 1)
    old = byte_col[target]
    byte_col[target] = (int(old) + 1) % 256
    try:
        failures = mp.verify()
        assert failures, "tampered copied byte must be rejected"
        assert any("copy" in str(f) for f in failures)
    finally:
        byte_col[target] = old


def test_copy_calldata_length_binding(mock):
    circ, mp = mock
    # a calldata copy event's declared length must match the tx table row
    q_col = mp.fixed[circ.copy.q_first_cd.index]
    len_col = mp.advice[circ.copy.len.index]
    target = next((r for r in range(mp.n) if q_col[r] == 1), None)
    if target is None:
        pytest.skip("fixture blocks carry no nonempty calldata")
    old = len_col[target]
    len_col[target] = int(old) + 1
    try:
        failures = mp.verify()
        assert failures, "calldata length mismatch must be rejected"
        assert any("copy/tx_len" in str(f) or "lookup" in str(f) for f in failures)
    finally:
        len_col[target] = old


def test_tampered_keccak_digest_rejected(mock):
    circ, mp = mock
    # flipping a keccak-table digest breaks the bytecode->keccak lookup
    hi_col = mp.advice[circ.keccak.hash_hi.index]
    q_col = mp.fixed[circ.keccak.q.index]
    target = next(r for r in range(mp.n) if q_col[r] == 1)
    old = hi_col[target]
    hi_col[target] = (int(old) + 1) % FR_MOD
    try:
        failures = mp.verify()
        assert failures, "tampered keccak digest must be rejected"
    finally:
        hi_col[target] = old

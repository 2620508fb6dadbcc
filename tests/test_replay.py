"""Per-opcode EVM replay conformance (witness/replay.py).

The replay must reproduce the traced structLog stream exactly — pc, opcode
byte, and call depth at every step, and the tx's returnValue — for every
transaction in the reference fixture set, and the witness builder must
fold its events (real EXP operands, SHA3 preimages, opcode-granular
storage rows) into the chunk witness (reference: bus-mapping crate,
SURVEY.md section 2.2; VERDICT round-2 item 5).
"""
import glob
import json
import os

import pytest

from scroll_prover_tpu.hashes.keccak import keccak256
from scroll_prover_tpu.l2types.block_trace import BlockTrace
from scroll_prover_tpu.utils import load_chunk
from scroll_prover_tpu.witness.block import (
    TAG_STORAGE,
    chunk_trace_to_witness_block,
)
from scroll_prover_tpu.witness.replay import ReplayDivergence, replay_tx

FIXTURES = "/root/reference/integration/tests/extra_traces"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not mounted"
)


def _iter_txs():
    for fp in sorted(glob.glob(f"{FIXTURES}/**/block_*.json", recursive=True)):
        try:
            with open(fp) as fh:
                d = json.load(fh)
        except (json.JSONDecodeError, OSError):
            continue
        tr = BlockTrace.from_json(d.get("blockTrace", d))
        for ti, tx in enumerate(tr.transactions):
            if ti < len(tr.execution_results):
                yield fp, tr, tx, tr.execution_results[ti]


def test_every_fixture_tx_replays_exactly():
    """Zero divergence across the full fixture corpus: every traced step
    reproduced (pc/op/depth), every returnValue matched."""
    ok = steps = 0
    failures = []
    for fp, tr, tx, er in _iter_txs():
        if not er.struct_logs and not er.byte_code:
            continue
        try:
            r = replay_tx(tr, tx, er)
        except ReplayDivergence as e:
            failures.append(f"{os.path.basename(fp)} {tx.tx_hash[:18]}: {e}")
            continue
        assert r.steps == len(er.struct_logs)
        ok += 1
        steps += r.steps
    assert not failures, failures[:10]
    assert ok > 100 and steps > 100_000  # the corpus is non-trivial


def test_replay_emits_real_events():
    """The corpus exercises EXP, SHA3 and storage opcodes with verifiable
    outputs: keccak(preimage) events and pow(base, exp, 2**256) results."""
    exp = sha3 = storage = 0
    for _fp, tr, tx, er in _iter_txs():
        if not er.struct_logs:
            continue
        try:
            r = replay_tx(tr, tx, er)
        except ReplayDivergence:
            continue
        for base, e, out in r.exp_events:
            assert out == pow(base, e, 1 << 256)
            exp += 1
        sha3 += len(r.sha3_events)
        storage += len(r.storage_accesses)
    assert exp > 50 and sha3 > 200 and storage > 500


def test_witness_block_uses_replay():
    """chunk_trace_to_witness_block folds replay events in by default:
    per-step code hashes on sub-frames, real EXP operands, SHA3-derived
    keccak events, opcode-granular storage rows."""
    traces = load_chunk(f"{FIXTURES}/batch_24/chunk_115")
    wb = chunk_trace_to_witness_block(traces)
    n_with_logs = sum(
        1
        for tr in traces
        for ti, _tx in enumerate(tr.transactions)
        if ti < len(tr.execution_results)
        and tr.execution_results[ti].struct_logs
    )
    assert wb.replayed_txs == n_with_logs  # no fallback on this chunk
    # every replayed step inside code carries its frame's code hash, and
    # that code is present in the bytecode table under the same hash
    bound = [s for s in wb.steps if s.code_hash]
    assert bound
    for s in bound[:200]:
        code = wb.bytecode_map.get(f"{s.code_hash:064x}")
        assert code is not None
        assert s.pc < len(code)
        assert code[s.pc] == s.op_byte
    # real keccak events (SHA3 preimages hash to their digests)
    assert all(keccak256(ev.preimage) == ev.digest for ev in wb.keccak_events)
    # opcode-granular storage writes exist (SSTOREs in the corpus)
    ws = [r for r in wb.rw_rows if r.tag == TAG_STORAGE and r.is_write]
    assert ws, "no opcode-granular storage writes captured"


def test_statistical_fallback_env_gate(monkeypatch):
    monkeypatch.setenv("SPT_NO_REPLAY", "1")
    traces = load_chunk(f"{FIXTURES}/batch_24/chunk_115")[:1]
    wb = chunk_trace_to_witness_block(traces)
    assert wb.replayed_txs == 0
    assert wb.num_steps > 0  # statistical path still builds a witness

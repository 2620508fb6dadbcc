"""CCC parity vs the reference's live mainnet row profile.

The 10 batch-task fixtures (/root/reference/integration/tests/test_data/
batch_tasks/batch_task_2932{05..14}.json) record per-subcircuit row_usages
for 290 real Scroll-mainnet chunks alongside each chunk's full signed-tx
byte stream. This tier asserts that our CCC's byte-driven row models land
within 2x of the reference prover's measured usage for the circuits whose
load is determined by the transaction stream (tx, rlp, pi), and within 3x
for keccak/sig, whose load carries precompile traffic the chunk bytes
cannot see (VERDICT.md round-1 weak item 9: "no parity test against the
reference's row_usages fixture numbers").
"""
import base64
import glob
import json
import os

import pytest

from scroll_prover_tpu.witness.capacity import (
    SUB_CIRCUIT_NAMES,
    row_usage_from_chunk_stats,
)
from scroll_prover_tpu.witness.tx_bytes import scan_tx_lengths

_FIXTURES = sorted(
    glob.glob(
        "/root/reference/integration/tests/test_data/batch_tasks/batch_task_*.json"
    )
)

pytestmark = pytest.mark.skipif(
    not _FIXTURES, reason="reference batch-task fixtures unavailable"
)


def _chunks():
    for path in _FIXTURES:
        with open(path) as fh:
            task = json.load(fh)
        for ci, cp in zip(task["chunk_infos"], task["chunk_proofs"]):
            if ci.get("is_padding"):
                continue
            yield os.path.basename(path), ci, {
                u["name"]: u["row_number"] for u in cp["row_usages"]
            }


def test_tx_bytes_scan_partitions_exactly():
    total = 0
    for _name, ci, _ru in _chunks():
        raw = base64.b64decode(ci["tx_bytes"])
        lens = scan_tx_lengths(raw)
        assert sum(lens) == len(raw)
        assert lens and all(l > 64 for l in lens), "implausible tx size"
        total += 1
    assert total >= 280, f"expected ~290 fixture chunks, scanned {total}"


def test_row_usage_within_reference_bounds():
    worst = {}
    for name, ci, ref in _chunks():
        raw = base64.b64decode(ci["tx_bytes"])
        lens = scan_tx_lengths(raw)
        est = row_usage_from_chunk_stats(len(lens), len(raw)).as_dict()
        for sub, bound in (("tx", 2.0), ("rlp", 2.0), ("pi", 2.0),
                           ("keccak", 3.0), ("sig", 3.0)):
            if ref[sub] == 0:
                continue
            ratio = est[sub] / ref[sub]
            lo, hi = worst.get(sub, (ratio, ratio))
            worst[sub] = (min(lo, ratio), max(hi, ratio))
            assert 1 / bound <= ratio <= bound, (
                f"{name}: {sub} est {est[sub]} vs ref {ref[sub]} "
                f"(ratio {ratio:.2f} outside {bound}x)"
            )
    # the fit itself should be much tighter than the bound for tx/rlp
    assert worst["tx"][0] > 0.8 and worst["tx"][1] < 1.25, worst["tx"]
    assert worst["rlp"][0] > 0.8 and worst["rlp"][1] < 1.25, worst["rlp"]


def test_execution_circuit_ceilings_never_underestimate():
    """evm/state/bytecode/copy/mpt/poseidon cannot be predicted from chunk
    bytes (the mainnet profile shows a ~17x per-tx spread — load is set by
    execution), so the bytes-only estimator reports admission-control
    CEILINGS for them. Safety property, mirroring the reference's
    compare_ccc_results invariant (capacity_checker.rs:248 `r+1 >= l`):
    the ceiling must never under-estimate the reference prover's measured
    usage on any of the 290 mainnet chunks. A median-ratio cap keeps the
    ceilings from regressing into uselessness."""
    import statistics

    subs = ("evm", "state", "bytecode", "copy", "mpt", "poseidon")
    ratios = {s: [] for s in subs}
    for name, ci, ref in _chunks():
        raw = base64.b64decode(ci["tx_bytes"])
        lens = scan_tx_lengths(raw)
        est = row_usage_from_chunk_stats(
            len(lens), len(raw), ceilings=True
        ).as_dict()
        for sub in subs:
            if ref[sub] == 0:
                continue
            assert est[sub] >= ref[sub], (
                f"{name}: {sub} ceiling {est[sub]} under-estimates "
                f"reference usage {ref[sub]}"
            )
            ratios[sub].append(est[sub] / ref[sub])
    for sub in subs:
        med = statistics.median(ratios[sub])
        assert med <= 25, f"{sub} ceiling uselessly loose (median {med:.1f}x)"


def test_subcircuit_name_order_matches_reference():
    _name, _ci, ref = next(_chunks())
    assert list(ref.keys()) == SUB_CIRCUIT_NAMES

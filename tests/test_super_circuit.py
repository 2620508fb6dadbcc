"""ScrollSuperCircuit: mock proving on synthetic + reference traces."""
import os

import pytest

from scroll_prover_tpu.proof_system.plonk import MockProver
from scroll_prover_tpu.witness import chunk_trace_to_witness_block
from scroll_prover_tpu.zkevm import ScrollSuperCircuit, chunk_instance
from tests.test_witness_ccc import synthetic_trace, REF_CHUNK


def _mock_prove(traces):
    wb = chunk_trace_to_witness_block(traces)
    circuit = ScrollSuperCircuit.new_from_block(wb)
    k = circuit.min_k()
    prover = MockProver.run(k, circuit, [chunk_instance(wb)])
    return prover, circuit


def test_mock_prove_synthetic():
    prover, circuit = _mock_prove([synthetic_trace()])
    prover.assert_satisfied()
    assert circuit.row_usages_["evm"] > 0
    assert circuit.row_usages_["pi"] == 9
    assert circuit.row_usages_["poseidon"] > 60


def test_mock_catches_witness_tampering():
    wb = chunk_trace_to_witness_block([synthetic_trace()])
    circuit = ScrollSuperCircuit.new_from_block(wb)
    k = circuit.min_k()

    orig_assign = circuit.assign

    def bad_assign(cs, n, instance):
        tables = orig_assign(cs, n, instance)
        tables["advice"][circuit.tx.gas_acc.index][1] += 1  # break gas accumulation
        return tables

    circuit.assign = bad_assign
    fails = MockProver.run(k, circuit, [chunk_instance(wb)]).verify()
    assert any("tx/gas_acc" in f.name for f in fails)


def test_mock_catches_wrong_instance():
    wb = chunk_trace_to_witness_block([synthetic_trace()])
    circuit = ScrollSuperCircuit.new_from_block(wb)
    inst = chunk_instance(wb)
    inst[3] = (inst[3] + 1) % (2**128)  # wrong post state root
    fails = MockProver.run(circuit.min_k(), circuit, [inst]).verify()
    assert any(f.kind == "copy" for f in fails)


@pytest.mark.skipif(not os.path.isdir(REF_CHUNK), reason="reference fixtures not mounted")
def test_mock_prove_reference_chunk():
    from scroll_prover_tpu.utils import load_chunk

    traces = load_chunk(REF_CHUNK)[:8]  # first blocks of the chunk
    prover, circuit = _mock_prove(traces)
    prover.assert_satisfied()
    assert circuit.row_usages_["tx"] == 8

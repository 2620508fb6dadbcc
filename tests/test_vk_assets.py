"""Out-of-process vk flow: serialize vk to assets, verify from disk alone,
and fail-closed behavior when a vk is unavailable.

Mirrors the reference's assets protocol (vk_chunk_*.vkey via
CHUNK_VK_FILENAME env — reference integration/src/prove.rs:46-49,
SURVEY.md section 5 checkpoint/resume) and closes the round-1 ADVICE high
finding (provers.py:215 fail-open)."""
import os

import pytest

from scroll_prover_tpu.proof_system import kzg
from scroll_prover_tpu.proof_system.plonk.keygen import VerifyingKey, keygen
from scroll_prover_tpu.proof_system.plonk.prover import prove
from scroll_prover_tpu.proof_system.plonk.verifier import verify
from scroll_prover_tpu.prover import provers as pv

from test_plonk import K, MulCircuit


@pytest.fixture(scope="module")
def srs():
    return kzg.SRS.generate(K)


def test_vk_roundtrip_and_verify_from_bytes(srs):
    circ = MulCircuit()
    pk, vk = keygen(srs, K, circ)
    inst = [[7]]
    proof = prove(srs, pk, circ, inst, seed=b"t")
    blob = vk.to_bytes()
    vk2 = VerifyingKey.from_bytes(blob)
    assert vk2.transcript_repr() == vk.transcript_repr()
    assert verify(srs, vk2, inst, proof)
    # tampered proof still rejected through the deserialized vk
    bad = bytearray(proof)
    bad[70] ^= 1
    try:
        ok = verify(srs, vk2, inst, bytes(bad))
    except (AssertionError, ValueError):
        ok = False
    assert not ok


def test_register_and_load_vk_via_assets(srs, tmp_path):
    circ = MulCircuit()
    _pk, vk = keygen(srs, K, circ)
    vk_id = hex(vk.transcript_repr())
    assets = str(tmp_path)
    pv.register_vk(vk, assets)
    assert os.path.exists(os.path.join(assets, f"vk_{vk_id}.vkey"))
    # fresh registry (simulating a new process): load must come from disk
    pv._VK_REGISTRY.clear()
    got = pv.load_vk(vk_id, assets)
    assert got is not None and hex(got.transcript_repr()) == vk_id
    pv._VK_REGISTRY.clear()
    assert pv.load_vk(vk_id, "") is None  # no assets dir -> unavailable


def test_verify_inner_fails_closed(srs):
    """An inner payload whose vk is unknown must be REJECTED, not accepted."""
    from scroll_prover_tpu.prover.proofs import ProofPayload
    from scroll_prover_tpu.prover.chunk_info import ChunkInfo
    from scroll_prover_tpu.witness.block import WitnessBlock
    from scroll_prover_tpu.zkevm.super_circuit import chunk_instance

    wb = WitnessBlock(chain_id=1)
    info = ChunkInfo.from_witness_block(wb)
    inst = chunk_instance(wb)
    payload = ProofPayload(
        proof=b"\x00" * 64,
        instances=inst,
        protocol={"domain": {"k": K}},
        vk_id="0xdeadbeef",
    )
    verifier = pv.ChunkVerifier({K: srs}, assets_dir="")
    assert verifier._verify_inner(payload, info) is False

"""Full in-bytecode EVM verifier: the contract recomputes the whole Keccak
transcript + GWC fold from calldata and does ONE pairing — no host verifier
in the loop (VERDICT round-2 item 6; reference evm_verifier.yul +
unit_tests.rs:22-65 replay)."""
import pytest

from scroll_prover_tpu.evm.full_verifier import gen_full_verifier, proof_calldata
from scroll_prover_tpu.evm.interpreter import EvmRevert, deploy_and_call
from scroll_prover_tpu.proof_system import kzg
from scroll_prover_tpu.proof_system.plonk.keygen import keygen
from scroll_prover_tpu.proof_system.plonk.prover import prove
from scroll_prover_tpu.proof_system.plonk.verifier import verify
from scroll_prover_tpu.proof_system.transcript import KeccakTranscript

from test_plonk import K, MulCircuit, _instance


@pytest.fixture(scope="module")
def setup():
    srs = kzg.SRS.generate(K)
    circuit = MulCircuit()
    pk, vk = keygen(srs, K, circuit)
    proof = prove(
        srs, pk, circuit, _instance(),
        transcript_cls=KeccakTranscript, seed=b"evm-full",
    )
    assert verify(srs, vk, _instance(), proof, transcript_cls=KeccakTranscript)
    code, yul = gen_full_verifier(vk, srs, len(_instance()[0]))
    return srs, vk, proof, code, yul


def test_accepts_valid_proof(setup):
    _srs, _vk, proof, code, yul = setup
    calldata = proof_calldata(_instance()[0], proof)
    gas = deploy_and_call(code, calldata)
    assert gas > 0
    print(f"full-verifier gas: {gas}; bytecode {len(code)} B; yul {len(yul)} B")


def test_rejects_tampered_proof_bits(setup):
    _srs, _vk, proof, code, _yul = setup
    # flip one bit in several places: a commitment, an eval, a W point
    for byte_idx in (0, len(proof) // 2, len(proof) - 32):
        bad = bytearray(proof)
        bad[byte_idx] ^= 1
        calldata = proof_calldata(_instance()[0], bytes(bad))
        with pytest.raises(EvmRevert):
            deploy_and_call(code, calldata)


def test_rejects_wrong_instance(setup):
    _srs, _vk, proof, code, _yul = setup
    wrong = list(_instance()[0])
    wrong[0] = (wrong[0] + 1) % 1000
    calldata = proof_calldata(wrong, proof)
    with pytest.raises(EvmRevert):
        deploy_and_call(code, calldata)


def test_yul_artifact_shape(setup):
    _srs, vk, _proof, _code, yul = setup
    assert yul.startswith('object "plonk_verifier"')
    # hard-coded vk commitments appear in the source (reference
    # evm_verifier.yul:33-35 style)
    some_commit = next(c for c in vk.fixed_commitments if c is not None)
    assert hex(some_commit[0]) in yul or f"{some_commit[0]:#x}" in yul

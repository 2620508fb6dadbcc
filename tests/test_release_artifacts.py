"""Golden release-artifact replay (reference unit_tests.rs:22-65 +
integration.rs params tier).

Replays the committed release-v* artifacts with NO proving:
  * the outermost released proof + pi verify inside the mini-EVM against
    the released deployment bytecode (calldata = pi.data || proof.data —
    the reference splice layout, unit_tests.rs:32);
  * a 1-bit-tampered proof is rejected on-chain;
  * every vk_*.vkey loads, self-digests, and re-serializes bit-exact;
  * the chunk protocol parses with the expected domain/instance shape;
  * the sha256sum manifest matches the files on disk.

Two layouts are supported: the aspirational 6-layer bundle names
(pi_bundle_recursion.data — reference release.sh:20-28) and the round-5
two-layer TPU release (pi_layer1.data — the k=20 chunk inner + a
Keccak-transcript layer1 whose in-bytecode verifier replays it; see
scripts/package_release2.py for why layers 2-6 are absent).
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


def _outer_names() -> tuple[str, str]:
    """(pi, proof) filenames of the outermost released layer."""
    if os.path.exists(_rel("pi_bundle_recursion.data")):
        return "pi_bundle_recursion.data", "proof_bundle_recursion.data"
    return "pi_layer1.data", "proof_layer1.data"


def test_released_proof_verifies_in_evm():
    from scroll_prover_tpu.evm.harness import EVMVerifier, DEPLOYMENT_CODE_FILENAME

    pi_name, proof_name = _outer_names()
    calldata = _read(pi_name) + _read(proof_name)
    v = EVMVerifier(_read(DEPLOYMENT_CODE_FILENAME))
    gas = v.verify_evm_proof(calldata)
    assert gas is not None and gas > 100_000
    # the packaged run recorded its replay gas: must reproduce exactly
    if os.path.exists(_rel("layer1.json")):
        with open(_rel("layer1.json")) as fh:
            assert json.load(fh)["evm_gas"] == gas


def test_released_proof_tamper_rejected():
    from scroll_prover_tpu.evm.harness import EVMVerifier, DEPLOYMENT_CODE_FILENAME

    pi_name, proof_name = _outer_names()
    pi = _read(pi_name)
    proof = bytearray(_read(proof_name))
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
        # digest-named vks embed the transcript digest: vk_<0xdigest>.vkey
        name_digest = os.path.basename(p)[3:-5]
        if name_digest.startswith("0x"):
            assert hex(vk.transcript_repr()) == name_digest
        assert vk.to_bytes() == data


def test_released_chunk_protocol_shape():
    for name in ("chunk_chunk_0.protocol", "chunk_inner.protocol"):
        if os.path.exists(_rel(name)):
            break
    with open(_rel(name)) as fh:
        proto = json.load(fh)
    assert proto["domain"]["n"] == 1 << proto["domain"]["k"]
    assert proto["num_instance"], "protocol must declare instance count"
    if name == "chunk_inner.protocol":
        # the two-layer release's inner IS the k=20 production domain
        assert proto["domain"]["k"] == 20
        # and its vk must be the released one (digest binding)
        from scroll_prover_tpu.proof_system.plonk.keygen import VerifyingKey

        vk = VerifyingKey.from_bytes(_read("vk_chunk_inner.vkey"))
        assert proto["transcript_initial_state"] == hex(vk.transcript_repr())


def test_release_manifest_matches():
    with open(_rel("sha256sum")) as fh:
        lines = [l.split() for l in fh.read().splitlines() if l.strip()]
    assert lines
    for digest, name in lines:
        if name == "sha256sum":
            continue
        assert hashlib.sha256(_read(name)).hexdigest() == digest, name

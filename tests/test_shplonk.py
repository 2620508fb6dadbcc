"""SHPLONK/BDFG21 multiopen: roundtrip, tamper cases, proof-size advantage,
Blake2b transcript conformance (reference halo2 ships GWC19 + SHPLONK and a
Blake2bWrite transcript — Cargo.lock:1886-1908; SURVEY.md section 2.2 L1)."""
import pytest

from scroll_prover_tpu.proof_system import kzg
from scroll_prover_tpu.proof_system.plonk.keygen import keygen
from scroll_prover_tpu.proof_system.plonk.prover import prove
from scroll_prover_tpu.proof_system.plonk.verifier import (
    check_accumulator,
    verify,
)
from scroll_prover_tpu.proof_system.transcript import Blake2bTranscript

from test_plonk import K, MulCircuit, _instance


@pytest.fixture(scope="module")
def srs():
    return kzg.SRS.generate(K)


@pytest.fixture(scope="module")
def proof_and_vk(srs):
    circuit = MulCircuit()
    pk, vk = keygen(srs, K, circuit)
    proof = prove(srs, pk, circuit, _instance(), multiopen="shplonk")
    return proof, vk


def test_shplonk_roundtrip(srs, proof_and_vk):
    proof, vk = proof_and_vk
    assert verify(srs, vk, _instance(), proof, multiopen="shplonk")


def test_shplonk_rejects_gwc_verifier(srs, proof_and_vk):
    """A SHPLONK proof must not pass the GWC fold (different W layout)."""
    proof, vk = proof_and_vk
    assert not verify(srs, vk, _instance(), proof, multiopen="gwc")


def test_shplonk_rejects_tamper(srs, proof_and_vk):
    proof, vk = proof_and_vk
    bad = bytearray(proof)
    bad[len(bad) // 2] ^= 1
    assert not verify(srs, vk, _instance(), bytes(bad), multiopen="shplonk")


def test_shplonk_rejects_wrong_instance(srs, proof_and_vk):
    proof, vk = proof_and_vk
    assert not verify(srs, vk, [[8]], proof, multiopen="shplonk")


def test_shplonk_smaller_than_gwc(srs, proof_and_vk):
    """2 W-phase G1 points vs one per distinct opening point (5 here)."""
    proof, vk = proof_and_vk
    circuit = MulCircuit()
    pk, _ = keygen(srs, K, circuit)
    gwc = prove(srs, pk, circuit, _instance(), multiopen="gwc")
    assert len(proof) < len(gwc)


def test_shplonk_accumulator_form(srs, proof_and_vk):
    """The deferred-pairing (lhs, rhs) shape is scheme-agnostic."""
    proof, vk = proof_and_vk
    lhs, rhs = verify(
        srs, vk, _instance(), proof,
        multiopen="shplonk", return_pairing_inputs=True,
    )
    assert check_accumulator(srs, lhs, rhs)


def test_shplonk_blake2b_transcript(srs):
    """Blake2b transcript exercised end-to-end (reference Blake2bWrite)."""
    circuit = MulCircuit()
    pk, vk = keygen(srs, K, circuit)
    proof = prove(
        srs, pk, circuit, _instance(),
        transcript_cls=Blake2bTranscript, multiopen="shplonk",
    )
    assert verify(
        srs, vk, _instance(), proof,
        transcript_cls=Blake2bTranscript, multiopen="shplonk",
    )
    assert not verify(srs, vk, _instance(), proof, multiopen="shplonk")

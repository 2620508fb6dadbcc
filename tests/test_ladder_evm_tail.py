"""Keccak-transcript layer1 + full EVM verifier tail (release core).

The reference's OUTERMOST compression layer proves with a Keccak
transcript so the proof is EVM-verifiable (SURVEY §3.2 layer6,
integration/configs/layer6.config); scripts/prove_ladder20.py mirrors
that: layer1 over the k=20 chunk inner proves with KeccakTranscript,
the inner's KZG accumulator is folded into the host pairing AND into
the generated in-bytecode verifier (has_accumulator=True), and the
mini-EVM replays proof+pi. This test drives the identical path at toy
scale so the unattended TPU run only changes the inner.
"""
import pytest

from scroll_prover_tpu.proof_system import kzg
from scroll_prover_tpu.proof_system.plonk.keygen import keygen
from scroll_prover_tpu.proof_system.plonk.prover import prove
from scroll_prover_tpu.proof_system.plonk.verifier import (
    acc_from_limbs,
    verify,
)
from scroll_prover_tpu.proof_system.transcript import KeccakTranscript
from scroll_prover_tpu.prover.verifier_circuit import ACC_CELLS, VerifierCircuit

from test_plonk import K as INNER_K, MulCircuit, _instance


@pytest.mark.slow
def test_keccak_layer1_evm_replay(monkeypatch):
    from scroll_prover_tpu.evm.full_verifier import (
        gen_full_verifier,
        proof_calldata,
    )
    from scroll_prover_tpu.evm.interpreter import EvmRevert, deploy_and_call

    # wide lanes pack the ~1.25M-op toy verifier gadget into a CPU-sized
    # domain (k~17); the production run uses the same shape on the TPU
    monkeypatch.setenv("SPT_BUILDER_LANES", "16")
    monkeypatch.setenv("SPT_BUILDER_LOOKUP_COLS", "64")

    srs = kzg.SRS.generate(INNER_K)
    circuit = MulCircuit()
    pk, vk = keygen(srs, INNER_K, circuit)
    proof = prove(srs, pk, circuit, _instance(), seed=b"evm-tail")
    assert verify(srs, vk, _instance(), proof)

    l1 = VerifierCircuit(vk, proof, _instance()[0])
    k1 = l1.min_k()
    srs1 = kzg.SRS.generate(k1)
    pk1, vk1 = keygen(srs1, k1, l1)
    ci = l1.instance_for()
    proof1 = prove(
        srs1, pk1, l1, ci, seed=b"evm-tail-l1", transcript_cls=KeccakTranscript
    )
    assert verify(
        srs1, vk1, ci, proof1, transcript_cls=KeccakTranscript,
        fold_accumulator=acc_from_limbs(ci[0][:ACC_CELLS]),
    )

    code, yul = gen_full_verifier(vk1, srs1, len(ci[0]), has_accumulator=True)
    calldata = proof_calldata(ci[0], proof1)
    gas = deploy_and_call(code, calldata)
    assert gas > 0
    assert "plonk_verifier" in yul or yul  # YUL artifact emitted

    # tamper: one proof bit -> transcript diverges -> revert
    bad = bytearray(proof1)
    bad[len(bad) // 2] ^= 1
    with pytest.raises(EvmRevert):
        deploy_and_call(code, proof_calldata(ci[0], bytes(bad)))
    # tamper: one accumulator limb -> folded pairing fails -> revert
    bad_inst = list(ci[0])
    bad_inst[0] = (bad_inst[0] + 1) % (1 << 88)
    with pytest.raises(EvmRevert):
        deploy_and_call(code, proof_calldata(bad_inst, proof1))

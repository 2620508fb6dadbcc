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


# ---- accumulator-folding contract path (bundle layer6 shape) ---------------


class _AccCircuit:
    """Minimal circuit with 12 leading accumulator-limb instance cells (the
    bundle layer6 instance shape) plus one squared-witness public input.
    The accumulator cells are verifier-side inputs; the test supplies a
    valid deferred-pairing pair (R = tau*L holds exactly when
    e(L, s*G2) == e(R, G2))."""

    def __init__(self, acc12):
        self.acc12 = acc12

    def instance_list(self):
        return [self.acc12 + [49]]

    def configure(self, cs):
        self.a = cs.advice_column()
        self.sel = cs.selector()
        self.pi = cs.instance_column()
        cs.gate(
            "sq",
            self.sel.query() * (self.a.query() * self.a.query() - self.a.query(1)),
        )

    def assign(self, cs, n, instance):
        from scroll_prover_tpu.proof_system.plonk.cs import empty_assignment

        fixed = empty_assignment(cs.num_fixed, n)
        adv = empty_assignment(cs.num_advice, n)
        adv[self.a.index][0] = 7
        adv[self.a.index][1] = 49
        fixed[self.sel.index][0] = 1
        cs.copy(self.pi, 12, self.a, 1)  # instance[12] == 49
        return {"fixed": fixed, "advice": adv}


def test_contract_accumulator_fold():
    import hashlib

    from scroll_prover_tpu.curves.bn254_curve import G1, g1_generator
    from scroll_prover_tpu.fields.bn254 import FR_MOD
    from scroll_prover_tpu.proof_system.plonk.verifier import (
        acc_from_limbs,
        acc_limbs,
    )

    srs = kzg.SRS.generate(K)
    tau = int.from_bytes(
        hashlib.sha512(b"scroll-prover-tpu-test-srs").digest(), "little"
    ) % FR_MOD
    L = G1.mul(g1_generator(), 123456789)
    R = G1.mul(L, tau)
    acc12 = acc_limbs(L, R)

    circuit = _AccCircuit(acc12)
    pk, vk = keygen(srs, K, circuit)
    inst = circuit.instance_list()
    proof = prove(
        srs, pk, circuit, inst, transcript_cls=KeccakTranscript, seed=b"acc"
    )
    assert verify(
        srs, vk, inst, proof, transcript_cls=KeccakTranscript,
        fold_accumulator=acc_from_limbs(acc12),
    )
    code, _yul = gen_full_verifier(vk, srs, len(inst[0]), has_accumulator=True)
    calldata = proof_calldata(inst[0], proof)
    gas = deploy_and_call(code, calldata)
    assert gas > 0
    # tampered accumulator limb -> pairing (or on-curve check) fails
    bad_inst = list(inst[0])
    bad_inst[0] = (bad_inst[0] + 1) % (1 << 88)
    with pytest.raises(EvmRevert):
        deploy_and_call(code, proof_calldata(bad_inst, proof))
    # an on-curve but non-paired accumulator -> pairing fails
    wrong = acc_limbs(L, G1.mul(L, tau + 1)) + [49]
    # note: changing instances invalidates the SNARK transcript too, so
    # this exercises the combined rejection path
    with pytest.raises(EvmRevert):
        deploy_and_call(code, proof_calldata(wrong, proof))

"""Mini-EVM + verifier contract: PLONK proof verified through the EVM path."""
import pytest

from scroll_prover_tpu.evm import (
    EvmRevert, deploy_and_call, gen_verifier_bytecode,
)
from scroll_prover_tpu.evm.interpreter import EVM
from scroll_prover_tpu.curves.bn254_curve import G1, g1_generator
from scroll_prover_tpu.proof_system import kzg


def test_evm_basics():
    evm = EVM()
    # PUSH1 5 PUSH1 3 ADD PUSH0 MSTORE PUSH1 32 PUSH0 RETURN
    code = bytes([0x60, 5, 0x60, 3, 0x01, 0x5F, 0x52, 0x60, 32, 0x5F, 0xF3])
    out = evm.execute(code, b"")
    assert int.from_bytes(out, "big") == 8


def test_evm_keccak_and_calldata():
    evm = EVM()
    # keccak256(calldata[0:4]) -> return
    code = bytes(
        [0x60, 4, 0x5F, 0x5F, 0x37,        # calldatacopy(0, 0, 4)
         0x60, 4, 0x5F, 0x20,              # sha3(0, 4)
         0x5F, 0x52, 0x60, 32, 0x5F, 0xF3]
    )
    out = evm.execute(code, b"abcd")
    from scroll_prover_tpu.hashes import keccak256

    assert out == keccak256(b"abcd")


def test_evm_ec_precompiles():
    evm = EVM()
    g = g1_generator()
    g2pt = G1.double(g)
    data = (
        g[0].to_bytes(32, "big") + g[1].to_bytes(32, "big")
        + g[0].to_bytes(32, "big") + g[1].to_bytes(32, "big")
    )
    ok, out = evm._precompile(6, data)
    assert ok
    assert int.from_bytes(out[:32], "big") == g2pt[0]
    ok, out = evm._precompile(7, data[:64] + (3).to_bytes(32, "big"))
    assert ok
    want = G1.mul(g, 3)
    assert int.from_bytes(out[:32], "big") == want[0]


@pytest.fixture(scope="module")
def srs():
    return kzg.SRS.generate(4)


def test_verifier_contract_pairing(srs):
    """KZG-style check through the deployed contract: A = W, B = zW + C - vG
    satisfies e(A, sG2) == e(B, G2)."""
    import jax.numpy as jnp
    from scroll_prover_tpu.fields.limbs import FR_LIMB
    from scroll_prover_tpu.fields.bn254 import FR_MOD

    coeffs = [5, 11, 2]
    pm = jnp.asarray(FR_LIMB.encode(coeffs, mont=True))
    com = kzg.kzg_commit(srs, pm)
    z = 321
    val, wit = kzg.kzg_open(srs, pm, z)
    g = g1_generator()
    b_pt = G1.add(G1.add(G1.mul(wit, z), com), G1.neg(G1.mul(g, val)))
    bytecode = gen_verifier_bytecode(srs.g2, srs.s_g2)
    calldata = (
        wit[0].to_bytes(32, "big") + wit[1].to_bytes(32, "big")
        + b_pt[0].to_bytes(32, "big") + b_pt[1].to_bytes(32, "big")
    )
    gas = deploy_and_call(bytecode, calldata)
    assert gas > 0
    # tampered calldata must revert
    bad = bytearray(calldata)
    bad[40] ^= 1
    with pytest.raises(EvmRevert):
        deploy_and_call(bytecode, bytes(bad))


def test_plonk_proof_through_evm(srs):
    """Full PLONK verify with the final pairing executed in the EVM."""
    from tests.test_plonk import MulCircuit, _instance
    from scroll_prover_tpu.proof_system.plonk.keygen import keygen
    from scroll_prover_tpu.proof_system.plonk.prover import prove
    from scroll_prover_tpu.proof_system.plonk.verifier import verify

    srs6 = kzg.SRS.generate(6)
    circuit = MulCircuit()
    pk, vk = keygen(srs6, 6, circuit)
    proof = prove(srs6, pk, circuit, _instance())
    a_pt, b_pt = verify(srs6, vk, _instance(), proof, return_pairing_inputs=True)
    bytecode = gen_verifier_bytecode(srs6.g2, srs6.s_g2)
    calldata = (
        a_pt[0].to_bytes(32, "big") + a_pt[1].to_bytes(32, "big")
        + b_pt[0].to_bytes(32, "big") + b_pt[1].to_bytes(32, "big")
    )
    gas = deploy_and_call(bytecode, calldata)
    assert gas > 100_000  # pairing gas dominates

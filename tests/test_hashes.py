"""Keccak-256 against Ethereum test vectors; Poseidon structural checks."""
from scroll_prover_tpu.hashes import keccak256, poseidon_fr
from scroll_prover_tpu.fields.bn254 import FR_MOD


def test_keccak_vectors():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block (> 136 bytes)
    assert keccak256(b"a" * 200).hex() == keccak256(b"a" * 200).hex()
    two = keccak256(b"\x00" * 137)
    assert len(two) == 32 and two != keccak256(b"\x00" * 136)


def test_keccak_eth_address_shape():
    # keccak of an empty account code — the well-known EVM empty code hash
    assert keccak256(b"").hex().startswith("c5d24601")


def test_poseidon_determinism_and_separation():
    h = poseidon_fr
    a = h.hash([1, 2])
    assert 0 < a < FR_MOD
    assert a == h.hash([1, 2])
    assert a != h.hash([2, 1])
    assert h.hash2(1, 2, domain=0) != h.hash2(1, 2, domain=1)
    # permutation is a bijection-ish sanity: different inputs, different out
    assert h.permute([0, 0, 0]) != h.permute([0, 0, 1])


def test_poseidon_sponge_absorbs_multi_chunk():
    h = poseidon_fr
    assert h.hash([1, 2, 3, 4, 5]) != h.hash([1, 2, 3, 4])

"""zktrie: C++ backend vs Python reference, proofs, Poseidon cross-check."""
import pytest

from scroll_prover_tpu.trie import PyZkTrie, ZkTrie, verify_merkle_proof
from scroll_prover_tpu.trie.zktrie import native_available, _load, _fr_bytes
from scroll_prover_tpu.hashes.poseidon import poseidon_fr


def test_native_poseidon_matches_python():
    if not native_available():
        pytest.skip("native zktrie lib unavailable")
    import ctypes

    lib = _load()
    out = ctypes.create_string_buffer(32)
    lib.spt_zktrie_hash2(_fr_bytes(123), _fr_bytes(456), 1, out)
    got = int.from_bytes(out.raw, "little")
    assert got == poseidon_fr.hash2(123, 456, domain=1)


def test_trie_roots_match_python():
    if not native_available():
        pytest.skip("native zktrie lib unavailable")
    t1, t2 = ZkTrie(), PyZkTrie()
    pairs = [(5, 100), (6, 200), (1 << 50, 300), (7, 400), ((1 << 60) + 5, 500)]
    for k, v in pairs:
        t1.update(k, v)
        t2.update(k, v)
        assert t1.root() == t2.root()
    assert t1.get(6) == 200
    assert t1.get(999) is None
    # deletion
    t1.update(6, 0)
    t2.update(6, 0)
    assert t1.root() == t2.root()


def test_empty_and_single():
    t = PyZkTrie()
    assert t.root() == 0
    t.update(3, 9)
    r1 = t.root()
    assert r1 != 0
    t.update(3, 0)
    assert t.root() == 0


def test_merkle_proof_roundtrip():
    t = PyZkTrie()
    for k, v in [(2, 22), (3, 33), (70, 77)]:
        t.update(k, v)
    root = t.root()
    sib = t.prove(3)
    assert verify_merkle_proof(root, 3, 33, sib)
    assert not verify_merkle_proof(root, 3, 34, sib)
    if native_available():
        tn = ZkTrie()
        for k, v in [(2, 22), (3, 33), (70, 77)]:
            tn.update(k, v)
        assert tn.prove(3) == sib

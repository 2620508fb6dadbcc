"""Device batched Poseidon vs the host reference."""
from scroll_prover_tpu.hashes.poseidon import poseidon_fr
from scroll_prover_tpu.ops.poseidon_dev import PoseidonDev


def test_batched_hash2_matches_host():
    dev = PoseidonDev()
    a = [1, 2, 3, 12345, 0]
    b = [9, 8, 7, 54321, 0]
    got = dev.hash2_batch(a, b, domain=1)
    want = [poseidon_fr.hash2(x, y, domain=1) for x, y in zip(a, b)]
    assert got == want


def test_domain_separation():
    dev = PoseidonDev()
    h0 = dev.hash2_batch([5], [6], domain=0)
    h1 = dev.hash2_batch([5], [6], domain=1)
    assert h0 != h1

"""BLS12-381 G1 + blob KZG commitments."""
from scroll_prover_tpu.curves.bls12_381 import (
    BlobKzg, G1_GEN, R, g1_add, g1_compress, g1_decompress, g1_mul, g1_neg,
    is_on_curve,
)


def test_group_laws():
    g = G1_GEN
    assert is_on_curve(g)
    assert is_on_curve(g1_add(g, g))
    assert g1_mul(g, R) is None  # group order
    assert g1_add(g, g1_neg(g)) is None
    assert g1_add(g1_add(g, g), g) == g1_mul(g, 3)


def test_compress_roundtrip():
    for k in (1, 2, 12345):
        p = g1_mul(G1_GEN, k)
        b = g1_compress(p)
        assert len(b) == 48 and b[0] & 0x80
        assert g1_decompress(b) == p
    inf = g1_compress(None)
    assert inf[0] == 0xC0 and g1_decompress(inf) is None


def test_blob_kzg_commit_open():
    kzg = BlobKzg()
    coeffs = [0] * 4096
    coeffs[0], coeffs[5] = 7, 9
    com = kzg.commit(coeffs)
    assert is_on_curve(com) and com is not None
    z = 0xABCDEF
    y, wit = kzg.open_at(coeffs, z)
    assert kzg.verify_by_reeval(coeffs, z, y)
    assert is_on_curve(wit)
    # commitment is linear: commit(2f) == 2*commit(f)
    com2 = kzg.commit([2 * c % R for c in coeffs])
    assert com2 == g1_add(com, com)

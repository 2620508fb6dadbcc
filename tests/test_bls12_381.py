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


# ---- round-2: real pairing + point-evaluation proof (VERDICT item 7) -------


def test_pairing_bilinear():
    from scroll_prover_tpu.curves import bls12_381_pairing as bp
    from scroll_prover_tpu.curves.bls12_381 import G1_GEN, R, g1_mul, g1_neg

    g2 = bp.g2_generator()
    assert bp.g2_mul(g2, R) is None  # order r
    e1 = bp.pairing(G1_GEN, g2)
    assert e1 != bp.F12_ONE  # nondegenerate
    e2 = bp.pairing(g1_mul(G1_GEN, 5), bp.g2_mul(g2, 7))
    assert e2 == bp.f12_pow(e1, 35)  # bilinear
    assert bp.pairing_check(
        [(g1_mul(G1_GEN, 9), g2), (g1_neg(g1_mul(G1_GEN, 9)), g2)]
    )


def test_point_evaluation_proof_verifies():
    from scroll_prover_tpu.aggregator.blob import (
        point_evaluation_proof,
        verify_blob_proof,
    )

    blob = bytes(range(256)) * 8
    pkg = point_evaluation_proof(blob, b"seed")
    assert verify_blob_proof(pkg["commitment"], pkg["z"], pkg["y"], pkg["proof"])
    # tampered claims must fail the pairing
    assert not verify_blob_proof(
        pkg["commitment"], pkg["z"], (pkg["y"] + 1), pkg["proof"]
    )
    assert not verify_blob_proof(
        pkg["commitment"], (pkg["z"] + 1), pkg["y"], pkg["proof"]
    )

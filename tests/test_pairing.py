"""Host curve + pairing sanity: group laws, bilinearity, KZG-shaped check."""
from scroll_prover_tpu.curves.bn254_curve import G1, G2, g1_generator, g2_generator
from scroll_prover_tpu.curves import pairing as pr
from scroll_prover_tpu.fields.bn254 import FR_MOD


def test_group_laws():
    g = g1_generator()
    h = g2_generator()
    assert G1.is_on_curve(g)
    assert G2.is_on_curve(h)
    assert G1.add(g, G1.neg(g)) is None
    assert G1.mul(g, FR_MOD) is None  # group order
    assert G2.mul(h, FR_MOD) is None
    assert G1.add(G1.double(g), g) == G1.mul(g, 3)
    assert G2.add(G2.double(h), h) == G2.mul(h, 3)


def test_pairing_bilinear():
    g, h = g1_generator(), g2_generator()
    a, b = 7, 11
    # e(aG, bH) * e(-abG, H) == 1
    assert pr.pairing_check(
        [(G1.mul(g, a), G2.mul(h, b)), (G1.neg(G1.mul(g, a * b)), h)]
    )
    # and a wrong scalar fails
    assert not pr.pairing_check(
        [(G1.mul(g, a), G2.mul(h, b)), (G1.neg(G1.mul(g, a * b + 1)), h)]
    )


def test_pairing_kzg_shape():
    # toy KZG: commit to f(X) = 3 + 2X at secret s; open at z.
    g, h = g1_generator(), g2_generator()
    s = 12345
    f_s = (3 + 2 * s) % FR_MOD
    z = 77
    f_z = (3 + 2 * z) % FR_MOD
    # witness w(X) = (f(X)-f(z))/(X-z) = 2  -> W = 2*G
    com = G1.mul(g, f_s)
    w = G1.mul(g, 2)
    # e(C - f(z)G + zW, H) == e(W, sH)
    lhs = G1.add(G1.add(com, G1.neg(G1.mul(g, f_z))), G1.mul(w, z))
    assert pr.pairing_check([(lhs, h), (G1.neg(w), G2.mul(h, s))])

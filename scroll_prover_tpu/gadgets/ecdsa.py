"""In-circuit ECDSA verification over secp256k1 (the sig circuit's core).

Reference scope: zkevm-circuits' sig_circuit verifies every tx signature
with halo2-ecc's ECDSA chip (SURVEY.md section 2.2). Same non-native
machinery as the BN254 aggregation gadgets, instantiated for secp256k1's
base field p and scalar field n:

    assert r, s non-zero mod n (witnessed inverses)
    u1*s ≡ z (mod n),  u2*s ≡ r (mod n)      (so u1 = z/s, u2 = r/s)
    R = u1*G + u2*Q                           (msm_wide, 264-bit scalars)
    R.x = r + f*n over the integers, f in {0,1}   (x_R ≡ r mod n)

Q is range/on-curve checked at load. The (r, s, z) operands enter as
128-bit half cells (hi, lo) and are bound to their 88-bit limb
decompositions with exact in-Fr linear identities — the caller's table
cells therefore ARE the verified values.
"""
from __future__ import annotations

from ..curves import secp256k1 as secp
from .builder import Builder, Cell
from .ecc import EccChip, EcPointNN
from .nonnative import NN_BASE, NN_LIMB_BITS, NnInt, NonNativeChip


class EcdsaChip:
    def __init__(self, b: Builder):
        self.b = b
        self.nn_p = NonNativeChip(b, secp.P)
        self.nn_n = NonNativeChip(b, secp.N)
        self.ec = EccChip(self.nn_p, b_coeff=secp.B)

    def load_u256(self, hi: Cell, lo: Cell) -> NnInt:
        return self.nn_n.load_u256(hi, lo)

    def _assert_nonzero_mod_n(self, x: NnInt):
        nn = self.nn_n
        xv = x.value % nn.p
        assert xv != 0, "ecdsa: zero r/s in witness"
        inv = nn.load_witness(pow(xv, -1, nn.p))
        nn.mul(x, inv, sub_out=nn.load_constant(1))

    def verify(self, z: NnInt, r: NnInt, s: NnInt,
               pubkey: tuple[int, int]) -> EcPointNN:
        """Constrain ECDSA-verify(z, r, s, pubkey); returns the loaded
        (on-curve-checked) pubkey point for further binding."""
        nn = self.nn_n
        self._assert_nonzero_mod_n(r)
        self._assert_nonzero_mod_n(s)
        w = pow(s.value % nn.p, -1, nn.p)
        u1 = nn.load_witness(z.value % nn.p * w % nn.p)
        u2 = nn.load_witness(r.value % nn.p * w % nn.p)
        nn.mul(u1, s, sub_out=z)
        nn.mul(u2, s, sub_out=r)
        q = self.ec.load_point(pubkey)
        g = self.ec.load_constant(secp.G)
        rp = self.ec.msm_wide([u1, u2], [g, q], nn)
        # x_R ≡ r (mod n): x_R is canonical (< p < 2n), so x_R = r + f*n
        # exactly over the integers with a single bit f
        xr = rp.x
        assert xr.max_limb <= NN_BASE, "msm output not canonical"
        f_val = int(xr.value >= secp.N)
        f = self.b.assert_bit(self.b.witness(f_val))
        n_limbs = self.nn_n.p_limbs
        eqs = [
            [(1, xr.limbs[k]), (-1, r.limbs[k]), (-n_limbs[k], f)]
            for k in range(len(n_limbs))
        ]
        self.nn_p._assert_limbs_zero(
            eqs,
            pos_bound=[NN_BASE] * 3,
            neg_bound=[NN_BASE + n_limbs[k] for k in range(3)],
        )
        return q

"""MSM v2 pipeline correctness (round 4): parameterized signed windows,
out-block bucket accumulation, Pallas lane reduction, inversion-free host
fold (reference scope: halo2 variable-base Pippenger, SURVEY.md L1;
VERDICT round-3 item 2).

The default tier covers every piece OUTSIDE the Pallas kernels (digit
decomposition, host projective fold) against host Pippenger ground truth;
the kernels run end-to-end in interpret mode in the slow tier (minutes of
grid emulation each) and on silicon via bench.py.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from scroll_prover_tpu.curves.bn254_curve import G1, g1_generator, host_msm_jac
from scroll_prover_tpu.fields.bn254 import FQ_MOD, FR_MOD
from scroll_prover_tpu.fields.limbs import FQ_LIMB, FR_LIMB, N_LIMBS, ints_to_limbs
from scroll_prover_tpu.ops import ec, field_ops as fo
from scroll_prover_tpu.ops import msm_tile as mt


def _points(n: int):
    g = g1_generator()
    pts = []
    p = g
    for _ in range(n):
        pts.append(p)
        p = G1.add(p, g)
    return pts


def _dev_points(pts):
    xs = ints_to_limbs(np.array([q[0] for q in pts], dtype=object))
    ys = ints_to_limbs(np.array([q[1] for q in pts], dtype=object))
    return fo.to_mont(FQ_LIMB, jnp.asarray(np.stack([xs, ys], axis=1)))


@pytest.mark.parametrize("c", [4, 5, 6, 8])
def test_signed_digits_reconstruct(rng, c):
    """Digit decomposition invariant: sum_w (-1)^s_w d_w 2^(cw) == scalar,
    digits within [0, 2^(c-1)], for full-width scalars."""
    n = 1024  # one lane tile
    scalars = [int.from_bytes(rng.bytes(32), "big") % FR_MOD for v in range(n)]
    scalars[0] = FR_MOD - 1
    scalars[1] = 0
    sl = jnp.asarray(ints_to_limbs(scalars))
    digs, signs = mt._msm_prep_digits(sl, c)
    W, B = mt._wb(c)
    assert digs.shape == (W, 1, mt.SUB_T, 128)
    dig = np.asarray(digs).reshape(W, n)
    sgn = np.asarray(signs).reshape(W, n)
    assert dig.max() <= (1 << (c - 1))
    for i in range(0, n, 101):
        v = sum(
            (-1 if sgn[w, i] else 1) * int(dig[w, i]) << (c * w)
            for w in range(W)
        )
        assert v == scalars[i]


def test_host_fold_mont_matches_pippenger(rng):
    """Build a (W, B, 3, L) Montgomery bucket table on host from a known
    decomposition and check the projective host fold against host
    Pippenger (covers suffix sums, window doublings, identity handling)."""
    c = 6
    W, B = mt._wb(c)
    n = 64
    pts = _points(n)
    parts = rng.integers(0, 2**63, (n, 4))
    scalars = [
        (int(a) | int(b) << 63 | int(c2) << 126 | int(d) << 189) % FR_MOD
        for a, b, c2, d in parts
    ]
    buckets = {}
    for pt, s in zip(pts, scalars):
        carry = 0
        for w in range(W):
            d = ((s >> (c * w)) & ((1 << c) - 1)) + carry
            carry = int(d > (1 << (c - 1)))
            d -= (1 << c) * carry
            if d > 0:
                buckets.setdefault((w, d), []).append(pt)
            elif d < 0:
                buckets.setdefault((w, -d), []).append((pt[0], (-pt[1]) % FQ_MOD))
        assert carry == 0
    R = 1 << 256
    tbl = np.zeros((W, B, 3, N_LIMBS), dtype=np.uint32)
    one_m = ints_to_limbs([R % FQ_MOD])[0]
    for (w, b), blist in buckets.items():
        acc = None
        for pt in blist:
            acc = G1.add(acc, pt)
        if acc is None:
            continue  # bucket cancelled to identity: all-zero row (Z=0)
        tbl[w, b, 0] = ints_to_limbs([acc[0] * R % FQ_MOD])[0]
        tbl[w, b, 1] = ints_to_limbs([acc[1] * R % FQ_MOD])[0]
        tbl[w, b, 2] = one_m
    # empty buckets stay all-zero (Z=0 -> skipped by the fold)
    got = mt._host_fold_mont(tbl, c)
    assert got == host_msm_jac(pts, scalars)


@pytest.mark.slow
@pytest.mark.parametrize("c", [4, 6])
def test_msm_v2_interpret_end_to_end(rng, c):
    n = 1024
    pts = _points(n)
    scalars_int = [int(v) for v in rng.integers(1, 2**63, n)]
    scalars_int[0] = FR_MOD - 1
    scalars_int[1] = 0
    scalars = jnp.asarray(ints_to_limbs(scalars_int))
    got = mt.msm_v2_host(_dev_points(pts), scalars, c=c, interpret=True)
    assert got == host_msm_jac(pts, scalars_int)


@pytest.mark.slow
def test_msm_v2_batch_interpret(rng):
    n = 1024
    pts = _points(n)
    dev_pts = _dev_points(pts)
    cols_int = [
        [int.from_bytes(rng.bytes(32), "big") % FR_MOD for _ in range(n)],
        [int(v) for v in rng.integers(1, 2**16, n // 2)],  # short (zero-pad)
        [0] * n,  # identity column
    ]
    cols = [jnp.asarray(ints_to_limbs(ci)) for ci in cols_int]
    got = mt.msm_v2_host_batch(dev_pts, cols, c=6, interpret=True)
    for gi, ci in zip(got, cols_int):
        want = host_msm_jac(pts[: len(ci)], ci)
        assert gi == want


def test_verify_par_matches_verify():
    """verify_par (vectorized, the production mock tier) agrees with the
    row-loop verify on both a satisfied and a tampered circuit."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from scroll_prover_tpu.proof_system.plonk import Circuit, ConstraintSystem, MockProver
    from scroll_prover_tpu.proof_system.plonk.cs import empty_assignment

    class C(Circuit):
        def configure(self, cs):
            self.a = cs.advice_column()
            self.b = cs.advice_column()
            self.c = cs.advice_column()
            self.sel = cs.selector()
            self.tbl = cs.fixed_column()
            self.pi = cs.instance_column()
            cs.gate("mul", self.sel.query() * (self.a.query() * self.b.query() - self.c.query()))
            cs.lookup("rng", [self.sel.query() * self.a.query()], [self.tbl.query()])

        def assign(self, cs, n, instance):
            fixed = empty_assignment(cs.num_fixed, n)
            adv = empty_assignment(cs.num_advice, n)
            for i in range(8):
                a, b = (7 + i) % 16, i + 5
                adv[self.a.index][i] = a
                adv[self.b.index][i] = b
                adv[self.c.index][i] = a * b % FR_MOD
                fixed[self.sel.index][i] = 1
            for i in range(16):
                fixed[self.tbl.index][i] = i
            cs.copy(self.pi, 0, self.a, 0)
            return {"fixed": fixed, "advice": adv}

    mp = MockProver.run(6, C(), [[7]])
    assert mp.verify() == [] and mp.verify_par() == []
    # tamper: break a product, a copy, and a lookup input
    mp.advice[1][2] += 1
    slow = {(f.kind, f.name, f.row) for f in mp.verify()}
    fast = {(f.kind, f.name, f.row) for f in mp.verify_par()}
    assert slow and slow == fast


def test_packed_residency_proof_bytes_identical():
    """SPT_PACK_RESIDENT halves resident column HBM; proof bytes must be
    bit-identical to the unpacked prover, on BOTH quotient drivers
    (full-domain and coset-streaming)."""
    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    from scroll_prover_tpu.proof_system import kzg
    from scroll_prover_tpu.proof_system.plonk import Circuit
    from scroll_prover_tpu.proof_system.plonk.cs import empty_assignment
    from scroll_prover_tpu.proof_system.plonk.keygen import keygen
    from scroll_prover_tpu.proof_system.plonk.prover import prove
    from scroll_prover_tpu.proof_system.plonk.verifier import verify
    import scroll_prover_tpu.proof_system.plonk.prover as PR

    class C(Circuit):
        def configure(self, cs):
            self.a = cs.advice_column()
            self.b = cs.advice_column()
            self.c = cs.advice_column()
            self.sel = cs.selector()
            self.tbl = cs.fixed_column()
            self.pi = cs.instance_column()
            cs.gate("mul", self.sel.query() * (self.a.query() * self.b.query() - self.c.query()))
            cs.lookup("rng", [self.sel.query() * self.a.query()], [self.tbl.query()])

        def assign(self, cs, n, instance):
            fixed = empty_assignment(cs.num_fixed, n)
            adv = empty_assignment(cs.num_advice, n)
            for i in range(8):
                a, b = (7 + i) % 16, i + 5
                adv[self.a.index][i] = a
                adv[self.b.index][i] = b
                adv[self.c.index][i] = a * b % FR_MOD
                fixed[self.sel.index][i] = 1
            for i in range(16):
                fixed[self.tbl.index][i] = i
            cs.copy(self.pi, 0, self.a, 0)
            return {"fixed": fixed, "advice": adv}

    srs = kzg.SRS.generate(6)
    circ = C()
    inst = [[7]]
    old_pack = PR._PACK
    try:
        PR._PACK = False
        pk, vk = keygen(srs, 6, circ, inst)
        ref = prove(srs, pk, circ, inst, seed=b"packtest")
        assert verify(srs, vk, inst, ref)
        PR._PACK = True
        pk2, _ = keygen(srs, 6, circ, inst)
        assert prove(srs, pk2, circ, inst, seed=b"packtest") == ref
        os.environ["SPT_FORCE_STREAM"] = "1"
        try:
            pk3, _ = keygen(srs, 6, circ, inst)
            assert prove(srs, pk3, circ, inst, seed=b"packtest") == ref
        finally:
            del os.environ["SPT_FORCE_STREAM"]
    finally:
        PR._PACK = old_pack


def test_lowmem_proof_bytes_identical():
    """SPT_LOWMEM commits phases 1-3 from values over the Lagrange basis
    and defers every coeff form to post-phase-3 consume-as-you-go
    conversion; proof bytes must be bit-identical to the default path,
    with the lowmem KEYGEN too (Lagrange-basis fixed/sigma commits),
    and under a tight coset-cache cap."""
    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    from scroll_prover_tpu.proof_system import kzg
    from scroll_prover_tpu.proof_system.plonk import Circuit
    from scroll_prover_tpu.proof_system.plonk.cs import empty_assignment
    from scroll_prover_tpu.proof_system.plonk.keygen import keygen
    from scroll_prover_tpu.proof_system.plonk.prover import prove
    from scroll_prover_tpu.proof_system.plonk.verifier import verify
    import scroll_prover_tpu.proof_system.plonk.prover as PR
    import scroll_prover_tpu.proof_system.plonk.keygen as KG

    class C(Circuit):
        def configure(self, cs):
            self.a = cs.advice_column()
            self.b = cs.advice_column()
            self.c = cs.advice_column()
            self.sel = cs.selector()
            self.tbl = cs.fixed_column()
            self.pi = cs.instance_column()
            cs.gate("mul", self.sel.query() * (self.a.query() * self.b.query() - self.c.query()))
            cs.lookup("rng", [self.sel.query() * self.a.query()], [self.tbl.query()])

        def assign(self, cs, n, instance):
            fixed = empty_assignment(cs.num_fixed, n)
            adv = empty_assignment(cs.num_advice, n)
            for i in range(8):
                a, b = (7 + i) % 16, i + 5
                adv[self.a.index][i] = a
                adv[self.b.index][i] = b
                adv[self.c.index][i] = a * b % FR_MOD
                fixed[self.sel.index][i] = 1
            for i in range(16):
                fixed[self.tbl.index][i] = i
            cs.copy(self.pi, 0, self.a, 0)
            return {"fixed": fixed, "advice": adv}

    srs = kzg.SRS.generate(6)
    inst = [[7]]
    old = PR._LOWMEM
    try:
        PR._LOWMEM = False
        c1 = C()
        pk, vk = keygen(srs, 6, c1, inst)
        ref = prove(srs, pk, c1, inst, seed=b"lowmem")
        assert verify(srs, vk, inst, ref)

        PR._LOWMEM = True
        os.environ["SPT_LOWMEM"] = "1"  # keygen reads the env directly
        os.environ["SPT_COSET_CACHE_COLS"] = "2"
        try:
            c2 = C()
            pk2, vk2 = keygen(srs, 6, c2, inst)
            assert pk2.fixed_polys is None and pk2.sigma_polys is None
            assert vk2.transcript_repr() == vk.transcript_repr()
            got = prove(srs, pk2, c2, inst, seed=b"lowmem")
            assert got == ref
            # coeff forms materialized for reuse; a second prove (now with
            # polys resident) must still produce the same bytes
            assert pk2.fixed_polys is not None
            assert prove(srs, pk2, c2, inst, seed=b"lowmem") == ref
            os.environ["SPT_FORCE_STREAM"] = "1"
            try:
                c3 = C()
                pk3, _ = keygen(srs, 6, c3, inst)
                assert prove(srs, pk3, c3, inst, seed=b"lowmem") == ref
            finally:
                del os.environ["SPT_FORCE_STREAM"]
        finally:
            del os.environ["SPT_LOWMEM"]
            del os.environ["SPT_COSET_CACHE_COLS"]
    finally:
        PR._LOWMEM = old

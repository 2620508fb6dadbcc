"""msm_tile correctness in Pallas interpret mode (CPU tier).

Cross-checks the fused bucket kernel + composed-op lane reduction + host
bucket fold against the host Jacobian Pippenger, including zero scalars,
full-width scalars, sub-lane-count inputs (padding path), and the device
reducer (reference scope: halo2 variable-base Pippenger, SURVEY.md L1).
Interpret mode emulates the kernel grid step-by-step, so only one
end-to-end case runs in the default tier; the rest are slow-gated.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from scroll_prover_tpu.curves.bn254_curve import G1, g1_generator, host_msm_jac
from scroll_prover_tpu.fields.limbs import FQ_LIMB, FR_LIMB, N_LIMBS, ints_to_limbs
from scroll_prover_tpu.ops import ec, field_ops as fo
from scroll_prover_tpu.ops.msm_tile import msm_tile, msm_tile_host


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
    pa = np.stack([xs, ys], axis=1)
    return fo.to_mont(FQ_LIMB, jnp.asarray(pa))


@pytest.mark.slow
def test_msm_tile_host_matches_host_pippenger(rng):
    n = 1024
    pts = _points(n)
    scalars_int = [int(v) for v in rng.integers(1, 2**63, n)]
    scalars_int[0] = FR_LIMB.modulus - 1  # full-width scalar
    scalars_int[1] = 0  # zero scalar -> discarded bucket
    scalars = jnp.asarray(ints_to_limbs(scalars_int))
    got = msm_tile_host(_dev_points(pts), scalars, interpret=True)
    want = host_msm_jac(pts, scalars_int)
    assert got == want


def test_reduce_lanes_and_host_fold(rng):
    """Default-tier coverage of everything OUTSIDE the Pallas kernel: the
    composed-op lane tree-reduction and the host suffix-sum bucket fold,
    against a host-computed Pippenger bucket decomposition. (The kernel
    itself is interpret-checked in the slow tier and runs on silicon via
    bench.py.)"""
    from scroll_prover_tpu.fields.bn254 import FQ_MOD, FR_MOD
    from scroll_prover_tpu.ops.msm import C4, W4, B4
    from scroll_prover_tpu.ops import msm_tile as mt

    n = 64
    pts = _points(n)
    # full-width scalars < r, assembled from 4 x 64-bit draws
    parts = rng.integers(0, 2**63, (n, 4))
    scalars = [
        (int(a) | int(b) << 63 | int(c) << 126 | int(d) << 189) % FR_MOD
        for a, b, c, d in parts
    ]

    # host signed-digit bucket decomposition (same digit convention as
    # msm._signed_digits4: digits in [-8, 8], carry into the next window)
    buckets = {}
    for pt, s in zip(pts, scalars):
        carry = 0
        for w in range(W4):
            d = ((s >> (C4 * w)) & 0xF) + carry
            carry = int(d > 8)
            d -= 16 * carry
            if d > 0:
                buckets.setdefault((w, d), []).append(pt)
            elif d < 0:
                buckets.setdefault((w, -d), []).append((pt[0], (-pt[1]) % FQ_MOD))
        assert carry == 0  # top window of a reduced scalar never overflows

    # scatter each bucket's points across m lanes (identity-padded) and
    # encode as the kernel's (W4, B4, 3, L, st, lanes) projective table
    m, st, lanes = 4, 1, 4
    tbl = np.zeros((W4, B4, 3, 16, st, lanes), dtype=np.uint32)
    one_m = ints_to_limbs([(1 << 256) % FQ_MOD])[0]
    for w in range(W4):
        for b in range(1, B4):
            # round-robin the bucket's points over the lanes, host-summing
            # within a lane (a lane holds ONE projective accumulator)
            lane_pts = [None] * lanes
            for i, pt in enumerate(buckets.get((w, b), [])):
                j = i % lanes
                lane_pts[j] = pt if lane_pts[j] is None else G1.add(lane_pts[j], pt)
            filled = [pt for pt in lane_pts if pt is not None]
            enc = ec.encode_affine_mont(filled)  # (k, 2, L) Montgomery affine
            for i, (ex, ey) in enumerate(zip(enc[:, 0], enc[:, 1])):
                tbl[w, b, 0, :, 0, i] = ex
                tbl[w, b, 1, :, 0, i] = ey
                tbl[w, b, 2, :, 0, i] = one_m  # z = 1
            for i in range(len(filled), lanes):
                tbl[w, b, 1, :, 0, i] = one_m  # identity: (0, 1, 0)
        # bucket 0 row stays all-zero (discarded by the fold)

    reduced = np.asarray(mt._reduce_lanes(jnp.asarray(tbl)))
    got = mt._host_fold(reduced)
    assert got == host_msm_jac(pts, scalars)


@pytest.mark.slow
def test_msm_tile_padding_path(rng):
    n = 1536  # not a lane multiple: exercises the zero-scalar padding
    pts = _points(n)
    scalars_int = [int(v) for v in rng.integers(1, 2**63, n)]
    scalars = jnp.asarray(ints_to_limbs(scalars_int))
    got = msm_tile_host(_dev_points(pts), scalars, interpret=True)
    assert got == host_msm_jac(pts, scalars_int)


@pytest.mark.slow
def test_msm_tile_device_reducer_matches(rng):
    n = 1024
    pts = _points(n)
    scalars_int = [int(v) for v in rng.integers(0, 2**61, n)]
    scalars = jnp.asarray(ints_to_limbs(scalars_int))
    acc = msm_tile(_dev_points(pts), scalars, interpret=True)
    got = ec.decode_point(acc)
    assert got == host_msm_jac(pts, scalars_int)


@pytest.mark.slow
def test_msm_tile_all_zero_scalars_is_identity():
    n = 1024
    pts = _points(n)
    scalars = jnp.zeros((n, N_LIMBS), jnp.uint32)
    assert msm_tile_host(_dev_points(pts), scalars, interpret=True) is None


@pytest.mark.slow
def test_msm_tile_host_batch_matches_single(rng):
    """The multi-column kernel (shared points, per-column digit sets, one
    dispatch) matches per-column msm_tile_host, including a short column
    (zero-padded) and a zero column (identity -> None)."""
    from scroll_prover_tpu.ops.msm_tile import msm_tile_host_batch

    n = 1024
    pts = _points(n)
    dev_pts = _dev_points(pts)
    cols_int = [
        [int.from_bytes(rng.bytes(32), "big") % FR_LIMB.modulus for _ in range(n)],
        [int(v) for v in rng.integers(1, 2**16, n // 2)],  # short (zero-pad)
    ]
    cols = [jnp.asarray(ints_to_limbs(c)) for c in cols_int]
    got = msm_tile_host_batch(dev_pts, cols, interpret=True)
    for g, ci in zip(got, cols_int):
        want = host_msm_jac(pts[: len(ci)], ci)
        assert g == want

"""KZG polynomial commitment over BN254 (SRS, commit, open, verify).

Mirrors the consumed surface of the reference's ParamsKZG<Bn256>
(integration/src/prove.rs:1, integration/tests/integration.rs:12-22:
`load_params`, `downsize`, shared `g2`/`s_g2`): an SRS with monomial and
Lagrange G1 bases plus G2/s·G2, serialized per degree. Commit/open run on
device (ops/msm.py, ops/poly.py); verification is host-side pairing
(curves/pairing.py).

SRS generation here is from a seed tau — INSECURE, test/bench only; a
production deployment loads a ceremony file via save/load (same role as the
reference's download_setup.sh params files).
"""
from __future__ import annotations

import hashlib
import os

import jax
import struct

import jax.numpy as jnp
import numpy as np

from ..curves.bn254_curve import G1, G2, g1_generator, g2_generator
from ..curves import pairing as pr
from ..fields.bn254 import FR_MOD, FR_ROOT_OF_UNITY, FR_TWO_ADICITY
from ..fields.limbs import FQ_LIMB, FR_LIMB, N_LIMBS, ints_to_limbs
from ..ops import ec, msm, poly as poly_ops
from ..ops import field_ops as fo

_SRS_CACHE: dict = {}


class SRS:
    """Structured reference string for degrees up to 2^k.

    Host point lists (`g1_powers`/`g1_lagrange`) are LAZY when the SRS was
    synthesized on device (generate_fast): decoding 2 x 2^20 affine points
    costs a ~128 MB readback (~9 min over the 14 MB/s tunnel) that the
    device-resident prove path never needs — only save/downsize/host-MSM
    consumers trigger it."""

    def __init__(self, k: int, g1_powers, g1_lagrange, g2, s_g2):
        self.k = k
        self.n = 1 << k
        self._g1_powers = g1_powers      # list of affine int pairs, len n
        self._g1_lagrange = g1_lagrange  # list of affine int pairs, len n
        self.g2 = g2                    # G2 affine (Fq2 pair)
        self.s_g2 = s_g2
        self._dev_powers = None
        self._dev_lagrange = None

    @staticmethod
    def _decode_host(dev) -> list:
        from ..fields.limbs import limbs_to_ints

        n = dev.shape[0]
        flat = fo.from_mont(FQ_LIMB, dev.reshape(2 * n, -1))
        ints = limbs_to_ints(np.asarray(flat))
        out = []
        for i in range(n):
            x, y = ints[2 * i], ints[2 * i + 1]
            out.append(None if x == y == 0 else (x, y))
        return out

    @property
    def g1_powers(self) -> list:
        if self._g1_powers is None:
            self._g1_powers = self._decode_host(self._dev_powers)
        return self._g1_powers

    @property
    def g1_lagrange(self) -> list:
        if self._g1_lagrange is None:
            self._g1_lagrange = self._decode_host(self._dev_lagrange)
        return self._g1_lagrange

    # -- generation / io --------------------------------------------------

    @classmethod
    def generate(cls, k: int, seed: bytes = b"scroll-prover-tpu-test-srs"):
        """Deterministic toy SRS from a seed (INSECURE: tau is derivable)."""
        key = (k, seed)
        if key in _SRS_CACHE:
            return _SRS_CACHE[key]
        tau = int.from_bytes(hashlib.sha512(seed).digest(), "little") % FR_MOD
        n = 1 << k
        g = g1_generator()
        powers_scalars = [1] * n
        for i in range(1, n):
            powers_scalars[i] = powers_scalars[i - 1] * tau % FR_MOD
        g1_powers = _batch_base_mul(powers_scalars)
        # L_i(tau) = omega^i (tau^n - 1) / (n (tau - omega^i))
        omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - k), FR_MOD)
        vanish = (pow(tau, n, FR_MOD) - 1) % FR_MOD
        ninv = pow(n, -1, FR_MOD)
        lag_scalars = []
        wi = 1
        for i in range(n):
            denom = (tau - wi) % FR_MOD
            lag_scalars.append(
                wi * vanish % FR_MOD * ninv % FR_MOD * pow(denom, -1, FR_MOD) % FR_MOD
            )
            wi = wi * omega % FR_MOD
        g1_lagrange = _batch_base_mul(lag_scalars)
        h = g2_generator()
        srs = cls(k, g1_powers, g1_lagrange, h, G2.mul(h, tau))
        _SRS_CACHE[key] = srs
        return srs

    @classmethod
    def generate_fast(cls, k: int, seed: bytes = b"scroll-prover-tpu-test-srs"):
        """Device-path twin of generate(): the tau-power and Lagrange
        scalars, the fixed-base G1 multiplications, and the batched affine
        normalization all run on device (ops/fixed_base.py) — seconds at
        2^20 where the host window walk takes hours. Bit-identical points
        to generate() (exact integer arithmetic either way)."""
        key = (k, seed)
        if key in _SRS_CACHE:
            return _SRS_CACHE[key]
        from ..ops.fixed_base import fixed_base_mul_dev

        tau = int.from_bytes(hashlib.sha512(seed).digest(), "little") % FR_MOD
        n = 1 << k
        F = FR_LIMB
        tau_m = jnp.asarray(ints_to_limbs([tau * (1 << 256) % FR_MOD])[0])
        pow_m = poly_ops.powers_mont(F, tau_m, n)  # tau^i, Montgomery
        # L_i(tau) = w^i (tau^n - 1) / (n (tau - w^i)) — all on device
        omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - k), FR_MOD)
        om_m = poly_ops.powers_mont(F, jnp.asarray(
            ints_to_limbs([omega * (1 << 256) % FR_MOD])[0]), n)
        denom = fo.sub_mod(F, jnp.broadcast_to(tau_m, (n, N_LIMBS)), om_m)
        vanish_ninv = (pow(tau, n, FR_MOD) - 1) % FR_MOD * pow(n, -1, FR_MOD) % FR_MOD
        vn_m = jnp.asarray(ints_to_limbs([vanish_ninv * (1 << 256) % FR_MOD])[0])
        lag_m = fo.mont_mul(
            F,
            fo.mont_mul(F, om_m, fo.batch_inv_mont(F, denom)),
            jnp.broadcast_to(vn_m, (n, N_LIMBS)),
        )
        g = g1_generator()
        dev_powers = fixed_base_mul_dev(g, fo.from_mont(F, pow_m))
        dev_lagrange = fixed_base_mul_dev(g, fo.from_mont(F, lag_m))
        h = g2_generator()
        # host point lists stay LAZY (class docstring): the device views are
        # already affine-Montgomery, which is all the prove path touches
        srs = cls(k, None, None, h, G2.mul(h, tau))
        srs._dev_powers = dev_powers
        srs._dev_lagrange = dev_lagrange
        _SRS_CACHE[key] = srs
        return srs

    def downsize(self, k: int) -> "SRS":
        """Smaller-degree view: truncate monomial powers; Lagrange basis is
        rebuilt by a device group-iNTT over the truncated powers —
        O(n log n) point ops (ops/group_ntt.py), replacing round-1's n host
        MSMs. Shares g2/s_g2 (the invariant integration.rs:12-22 asserts)."""
        assert k <= self.k
        if k == self.k:
            return self
        from ..ops.group_ntt import group_intt_points

        n = 1 << k
        # group iNTT: lag[i] = (1/n) sum_j omega^{-ij} * powers[j]
        lag = group_intt_points(self.g1_powers[:n], k)
        return SRS(k, self.g1_powers[:n], lag, self.g2, self.s_g2)

    def save(self, path: str):
        with open(path, "wb") as fh:
            fh.write(struct.pack("<I", self.k))
            for plist in (self.g1_powers, self.g1_lagrange):
                for pt in plist:
                    fh.write(_enc_g1(pt))
            for pt in (self.g2, self.s_g2):
                fh.write(_enc_g2(pt))

    @classmethod
    def load(cls, path: str) -> "SRS":
        with open(path, "rb") as fh:
            (k,) = struct.unpack("<I", fh.read(4))
            n = 1 << k
            powers = [_dec_g1(fh.read(64)) for _ in range(n)]
            lagrange = [_dec_g1(fh.read(64)) for _ in range(n)]
            g2 = _dec_g2(fh.read(128))
            s_g2 = _dec_g2(fh.read(128))
        return cls(k, powers, lagrange, g2, s_g2)

    # -- device views ------------------------------------------------------

    def dev_powers(self):
        if self._dev_powers is None:
            self._dev_powers = jnp.asarray(ec.encode_affine_mont(self.g1_powers))
        return self._dev_powers

    def dev_lagrange(self):
        if self._dev_lagrange is None:
            self._dev_lagrange = jnp.asarray(ec.encode_affine_mont(self.g1_lagrange))
        return self._dev_lagrange


def _enc_g1(pt) -> bytes:
    if pt is None:
        return b"\x00" * 64
    return pt[0].to_bytes(32, "little") + pt[1].to_bytes(32, "little")


def _dec_g1(b: bytes):
    x = int.from_bytes(b[:32], "little")
    y = int.from_bytes(b[32:64], "little")
    return None if x == y == 0 else (x, y)


def _enc_g2(pt) -> bytes:
    (x0, x1), (y0, y1) = pt
    return b"".join(v.to_bytes(32, "little") for v in (x0, x1, y0, y1))


def _dec_g2(b: bytes):
    v = [int.from_bytes(b[32 * i : 32 * (i + 1)], "little") for i in range(4)]
    return ((v[0], v[1]), (v[2], v[3]))


def _batch_base_mul(scalars):
    """[s*G for s in scalars] via a fixed-base window table (host, Jacobian
    accumulation with one batched normalization at the end)."""
    from ..curves.bn254_curve import (
        jac_add_affine, jac_to_affine, jac_double, jac_from_affine,
    )

    g = g1_generator()
    c = 8
    windows = 256 // c
    table = []  # table[w][d] = d * 2^(cw) * G, affine
    base = jac_from_affine(g)
    for w in range(windows):
        row_j = []
        acc = None
        base_aff = jac_to_affine(base)
        for _d in range(1, 1 << c):
            acc = jac_add_affine(acc, base_aff)
            row_j.append(acc)
        table.append([None] + _batch_to_affine(row_j))
        for _ in range(c):
            base = jac_double(base)
    out_j = []
    for s in scalars:
        acc = None
        s = int(s) % FR_MOD
        for w in range(windows):
            d = (s >> (c * w)) & ((1 << c) - 1)
            if d:
                acc = jac_add_affine(acc, table[w][d])
        out_j.append(acc)
    return _batch_to_affine(out_j)


def _batch_to_affine(jacs):
    """Batch-normalize Jacobian points (one field inversion total)."""
    from ..curves.bn254_curve import P as _P

    idx = [i for i, j in enumerate(jacs) if j is not None and j[2] % _P != 0]
    zs = [jacs[i][2] for i in idx]
    out = [None] * len(jacs)
    if not zs:
        return out
    prefix = [1]
    for z in zs:
        prefix.append(prefix[-1] * z % _P)
    inv = pow(prefix[-1], _P - 2, _P)
    invs = [0] * len(zs)
    for i in range(len(zs) - 1, -1, -1):
        invs[i] = inv * prefix[i] % _P
        inv = inv * zs[i] % _P
    for k, i in enumerate(idx):
        x, y, _z = jacs[i]
        zi = invs[k]
        z2 = zi * zi % _P
        out[i] = (x * z2 % _P, y * z2 % _P * zi % _P)
    return out


def _host_msm(points, scalars):
    """Host Pippenger (Jacobian, batched); for sub-threshold commits."""
    from ..curves.bn254_curve import host_msm_jac

    return host_msm_jac(points, scalars)


# --- device commit/open -------------------------------------------------------


def _to_standard_limbs(coeffs_mont):
    return fo.from_mont(FR_LIMB, coeffs_mont)


# below this size, the XLA compile cost of the device MSM dwarfs the work
# (at n=8192 the CPU compile ran >15 min at 6.5 GB RSS); host Pippenger
# handles test-scale commits, and real-TPU deployments lower this via env
# once the one-time kernel compile is paid
DEVICE_MSM_THRESHOLD = int(os.environ.get("SPT_DEVICE_MSM_THRESHOLD", "65536"))

# mesh-sharded commit routing (multi-chip prove path): when set, every
# device-scale commit fans its points across the mesh and reduces the
# per-shard bucket tables — bit-identical results at any mesh width (EC
# addition is exact), asserted by __graft_entry__.dryrun_multichip
_COMMIT_MESH = None


def set_commit_mesh(mesh) -> None:
    global _COMMIT_MESH
    _COMMIT_MESH = mesh


def _threshold() -> int:
    return int(os.environ.get("SPT_DEVICE_MSM_THRESHOLD", str(DEVICE_MSM_THRESHOLD)))


def _commit_sharded(srs: SRS, coeffs_mont, basis: str):
    import jax as _jax

    from ..ops import ec as _ec
    from ..parallel.msm_sharded import msm_sharded, msm_tile_sharded

    n = coeffs_mont.shape[0]
    base = srs.dev_powers() if basis == "monomial" else srs.dev_lagrange()
    scalars = _to_standard_limbs(coeffs_mont)
    if _jax.default_backend() == "tpu":
        return msm_tile_sharded(_COMMIT_MESH, base[:n], scalars)
    return ec.decode_point(msm_sharded(_COMMIT_MESH, base[:n], scalars))


def kzg_commit(srs: SRS, coeffs_mont, basis: str = "monomial"):
    """Commit to (n, L) Montgomery coefficients (or Lagrange evals). Returns
    host affine point (or None)."""
    n = coeffs_mont.shape[0]
    assert n <= srs.n
    if _COMMIT_MESH is not None and n >= _threshold():
        return _commit_sharded(srs, coeffs_mont, basis)
    if n < _threshold():
        from ..fields.limbs import limbs_to_ints

        host_pts = srs.g1_powers if basis == "monomial" else srs.g1_lagrange
        scalars = limbs_to_ints(np.asarray(_to_standard_limbs(coeffs_mont)))
        return _host_msm(host_pts[:n], scalars)
    base = srs.dev_powers() if basis == "monomial" else srs.dev_lagrange()
    scalars = _to_standard_limbs(coeffs_mont)
    impl = os.environ.get("SPT_MSM_IMPL", "auto")
    if impl == "scatter" or (impl == "auto" and jax.default_backend() == "cpu"):
        # composed-op path (CPU test backend: pallas TPU kernels don't run)
        pt = msm.msm_padded(base[:n], scalars)
        return ec.decode_point(pt)
    from ..ops.msm_tile import msm_v2_host

    return msm_v2_host(base[:n], scalars)


def kzg_commit_batch(srs: SRS, coeffs_list, basis: str = "monomial"):
    """Commit to several (n_i, L) Montgomery coefficient columns over the
    SAME SRS powers in one device dispatch chain: the bucket kernel takes a
    column axis (ops/msm_tile.msm_tile_host_batch), so the per-commit
    tunnel floor (RTT sync + table readback, ~1 s each on the tunneled
    backend) is paid once per group. Falls back to per-column kzg_commit
    off-device / below the device threshold."""
    coeffs_list = list(coeffs_list)
    if not coeffs_list:
        return []
    n_max = max(c.shape[0] for c in coeffs_list)
    if _COMMIT_MESH is not None and n_max >= _threshold():
        return [kzg_commit(srs, c, basis) for c in coeffs_list]
    impl = os.environ.get("SPT_MSM_IMPL", "auto")
    use_batch = (
        n_max >= _threshold()
        and impl != "scatter"
        and (impl != "auto" or jax.default_backend() != "cpu")
    )
    if not use_batch:
        return [kzg_commit(srs, c, basis) for c in coeffs_list]
    from ..ops.msm_tile import msm_v2_host_batch

    base = srs.dev_powers() if basis == "monomial" else srs.dev_lagrange()
    # per-dispatch cap: each column's raw lane-bucket table is ~278 MB HBM
    # at 2^20 points with 6-bit windows (W*B*3*L*1024 u32); 8 columns plus
    # the reduction transpose ≈ 4.5 GB transient of the 16 GB HBM
    cap = int(os.environ.get("SPT_MSM_BATCH", "8"))
    out = []
    for i in range(0, len(coeffs_list), max(cap, 1)):
        grp = coeffs_list[i : i + max(cap, 1)]
        scalars = [_to_standard_limbs(c) for c in grp]
        out.extend(msm_v2_host_batch(base[:n_max], scalars))
    return out


def kzg_open(srs: SRS, coeffs_mont, z: int):
    """Open f at z: returns (eval f(z) as int, witness commitment W)."""
    zm = jnp.asarray(ints_to_limbs([z * (1 << 256) % FR_MOD])[0])
    ev = poly_ops.eval_poly_mont(FR_LIMB, coeffs_mont, zm)
    q = poly_ops.kzg_quotient_mont(FR_LIMB, coeffs_mont, zm)
    w = kzg_commit(srs, q)
    ev_int = FR_LIMB.decode(np.asarray(ev)[None, :])[0]
    return ev_int, w


def verify_single_open(srs: SRS, commitment, z: int, value: int, witness) -> bool:
    """e(C - v*G + z*W, G2) == e(W, s*G2)."""
    g = g1_generator()
    lhs = G1.add(
        G1.add(commitment, G1.neg(G1.mul(g, value))), G1.mul(witness, z)
    )
    return pr.pairing_check(
        [(lhs, srs.g2), (G1.neg(witness), srs.s_g2)]
    )

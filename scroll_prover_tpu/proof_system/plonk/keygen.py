"""Keygen: proving key / verifying key construction.

vk = domain + commitments to fixed columns and permutation sigma polys +
constraint-system shape (mirrors the halo2 vk the reference serializes as
`vk_chunk_*.vkey`, SURVEY.md section 2.4 "u32_be k then commitments").
pk = vk + coefficient forms of fixed/sigma polys + Lagrange-indicator polys.

Sigma construction: the classic cycle-splice — sigma starts as the identity
permutation over the (perm_column x row) grid; each copy constraint splices
two cycles by swapping images. Sigma poly values are coset labels
delta^j * omega^i.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ...fields.bn254 import FR_GENERATOR, FR_MOD, FR_TWO_ADICITY
from ...fields.limbs import FR_LIMB
from ...hashes.keccak import keccak256
from ...ops.ntt import EvaluationDomain
from ..kzg import SRS, kzg_commit
from .cs import Circuit, ConstraintSystem

# coset shift: DELTA generates distinct cosets of the 2^k subgroup H
DELTA = pow(FR_GENERATOR, 1 << FR_TWO_ADICITY, FR_MOD)


def _to_mont_dev(col_ints) -> jnp.ndarray:
    if (
        isinstance(col_ints, np.ndarray)
        and col_ints.dtype == np.uint32
        and col_ints.ndim == 2
    ):
        # packed (n, 8) standard-form words (assignment disk cache):
        # upload half the bytes, split limbs + to-Montgomery on device
        from ...ops import field_ops as fo

        return fo.to_mont(FR_LIMB, fo.unpack_limbs(jnp.asarray(col_ints)))
    return jnp.asarray(FR_LIMB.encode([int(v) for v in col_ints], mont=True))


@dataclass
class VerifyingKey:
    k: int
    cs: ConstraintSystem
    fixed_commitments: list
    sigma_commitments: list
    domain: EvaluationDomain = field(repr=False)

    def transcript_repr(self) -> int:
        """Digest absorbed into every transcript (binds proof to circuit)."""
        h = bytearray()
        h += self.k.to_bytes(4, "big")
        for c in self.fixed_commitments + self.sigma_commitments:
            h += b"\x00" * 64 if c is None else (
                c[0].to_bytes(32, "little") + c[1].to_bytes(32, "little")
            )
        h += len(self.cs.gates).to_bytes(4, "big")
        return int.from_bytes(keccak256(bytes(h)), "big") % FR_MOD

    def to_bytes(self) -> bytes:
        """Serialize for out-of-process verification (reference vk layout:
        u32-be k then commitments — release-v0.13.1/vk_chunk.vkey starts
        0x00000019; SURVEY.md section 2.4), followed by the constraint-system
        shape so a fresh process can verify without re-running keygen."""
        import pickle

        head = bytearray(b"SPTVK1")
        head += self.k.to_bytes(4, "big")
        head += len(self.fixed_commitments).to_bytes(4, "big")
        head += len(self.sigma_commitments).to_bytes(4, "big")
        for c in self.fixed_commitments + self.sigma_commitments:
            head += b"\x00" * 64 if c is None else (
                c[0].to_bytes(32, "little") + c[1].to_bytes(32, "little")
            )
        blob = pickle.dumps(
            {"gates": self.cs.gates, "lookups": self.cs.lookups,
             "perm_columns": self.cs.perm_columns,
             "num_fixed": self.cs.num_fixed, "num_advice": self.cs.num_advice,
             "num_instance": self.cs.num_instance,
             "num_challenges": self.cs.num_challenges}
        )
        return bytes(head) + len(blob).to_bytes(8, "big") + blob

    @classmethod
    def from_bytes(cls, data: bytes) -> "VerifyingKey":
        import pickle

        assert data[:6] == b"SPTVK1", "bad vk magic"
        k = int.from_bytes(data[6:10], "big")
        nf = int.from_bytes(data[10:14], "big")
        ns = int.from_bytes(data[14:18], "big")
        off = 18
        coms = []
        for _ in range(nf + ns):
            x = int.from_bytes(data[off : off + 32], "little")
            y = int.from_bytes(data[off + 32 : off + 64], "little")
            coms.append(None if x == y == 0 else (x, y))
            off += 64
        blen = int.from_bytes(data[off : off + 8], "big")
        shape = pickle.loads(data[off + 8 : off + 8 + blen])
        cs = ConstraintSystem()
        cs.gates = shape["gates"]
        cs.lookups = shape["lookups"]
        cs.perm_columns = shape["perm_columns"]
        cs.num_fixed = shape["num_fixed"]
        cs.num_advice = shape["num_advice"]
        cs.num_instance = shape["num_instance"]
        cs.num_challenges = shape["num_challenges"]
        dom = EvaluationDomain(k, _extended_j(cs))
        return cls(k, cs, coms[:nf], coms[nf:], dom)


@dataclass
class ProvingKey:
    vk: VerifyingKey
    fixed_polys: list          # device (n, L) Montgomery coeff forms
    fixed_values: list         # host object arrays (lookup tables need values)
    sigma_polys: list
    sigma_values: "_SigmaValues"  # lazy device-computed sigma columns
    l0: jnp.ndarray = None
    l_last: jnp.ndarray = None
    l_active: np.ndarray = None  # host 0/1 mask of active gate rows

    def sigma_col_mont(self, jj: int) -> jnp.ndarray:
        """(n, L) Montgomery device values of sigma column jj."""
        return self.sigma_values.col_mont(jj)


class _SigmaValues:
    """sigma[j][i] = delta^{cj} * omega^{ci} with (cj, ci) = divmod(
    nxt[j*n+i], n) — computed ON DEVICE as a gather + one Montgomery mul
    (the host build was ~100M Python big-int ops at k=20/100+ columns:
    minutes of pure interpreter time in keygen AND prove). Indexable like
    the old list-of-lists for the host consumers that remain (decode on
    demand, test-size only)."""

    def __init__(self, nxt: np.ndarray, m: int, n: int, omega: int):
        self.nxt = nxt
        self.m = m
        self.n = n
        from ...ops import poly as poly_ops
        from ...ops import field_ops as fo
        from ...fields.limbs import ints_to_limbs

        om_m = jnp.asarray(ints_to_limbs([omega * (1 << 256) % FR_MOD])[0])
        self._om_pows = poly_ops.powers_mont(FR_LIMB, om_m, n)
        delta_pows = [
            pow(DELTA, j, FR_MOD) * (1 << 256) % FR_MOD for j in range(m)
        ]
        self._delta_pows = jnp.asarray(ints_to_limbs(delta_pows)) if m else None

    def col_mont(self, jj: int) -> jnp.ndarray:
        from ...ops import field_ops as fo

        idx = self.nxt[jj * self.n : (jj + 1) * self.n]
        cj = jnp.asarray(idx // self.n, dtype=jnp.int32)
        ci = jnp.asarray(idx % self.n, dtype=jnp.int32)
        return fo.mont_mul(
            FR_LIMB, self._om_pows[ci], self._delta_pows[cj]
        )

    def __len__(self):
        return self.m

    def __getitem__(self, jj: int) -> list:
        """Host ints (standard form) — test-size consumers only."""
        std = np.asarray(
            jnp.asarray(col_from_mont(self.col_mont(jj)))
        )
        from ...fields.limbs import limbs_to_ints

        return limbs_to_ints(std)


def col_from_mont(arr):
    from ...ops import field_ops as fo

    return fo.from_mont(FR_LIMB, arr)


def keygen(srs: SRS, k: int, circuit: Circuit, instance=None, ckpt=None):
    """Returns (pk, vk). Fixed columns come from a reference assignment with
    zero instance (fixed content must not depend on the witness). `ckpt`
    (a plonk.checkpoint.ProveCheckpoint) memoizes the fixed/sigma
    commitment MSMs across process restarts of a production prove."""
    cs = ConstraintSystem()
    circuit.configure(cs)
    n = 1 << k
    dom = EvaluationDomain(k, _extended_j(cs))
    inst = np.empty((cs.num_instance, n), dtype=object)
    inst[:] = 0
    from .cs import assign_cached

    tables = assign_cached(circuit, cs, n, inst)
    fixed_vals = [tables["fixed"][i] for i in range(cs.num_fixed)]

    lowmem = os.environ.get("SPT_LOWMEM") == "1"
    omega = dom.omega
    sigma_vals = _SigmaValues(
        _build_next(cs, n), len(cs.perm_columns), n, omega
    )
    if lowmem:
        # commit straight from values over the Lagrange-basis SRS (same
        # points — same polynomial, different basis) and defer the coeff
        # forms to the first prove(), which converts them consume-as-you-go
        # after its value tables are released: at k=20 a 200-column circuit
        # holds ~7 GB/form, and keygen must not leave both resident
        from ..kzg import kzg_commit_batch

        # keygen's resident set is tiny (one commit group + the SRS), so
        # it can batch wider than the prove (whose value tables crowd HBM)
        cb = int(
            os.environ.get(
                "SPT_KEYGEN_COMMIT_BATCH",
                os.environ.get("SPT_COMMIT_BATCH", "8"),
            )
        )

        import logging as _logging

        _klog = _logging.getLogger(__name__)

        def commit_vals(cols):
            out = []
            for i in range(0, len(cols), cb):
                grp = [_to_mont_dev(c) for c in cols[i : i + cb]]
                out.extend(kzg_commit_batch(srs, grp, basis="lagrange"))
                del grp
                if len(cols) > cb:
                    _klog.info(
                        "keygen commit %d/%d", min(i + cb, len(cols)), len(cols)
                    )
            return out

        fixed_polys = None
        fixed_coms = (
            commit_vals(fixed_vals)
            if ckpt is None
            else ckpt.points("kg_fixed", lambda: commit_vals(fixed_vals))
        )
        from ..kzg import kzg_commit_batch as _kcb

        def commit_sigma():
            out = []
            for i in range(0, len(sigma_vals), cb):
                grp = [
                    sigma_vals.col_mont(j)
                    for j in range(i, min(i + cb, len(sigma_vals)))
                ]
                out.extend(_kcb(srs, grp, basis="lagrange"))
                del grp
                if len(sigma_vals) > cb:
                    _klog.info(
                        "keygen sigma commit %d/%d",
                        min(i + cb, len(sigma_vals)), len(sigma_vals),
                    )
            return out

        def commit_sigma_logged():
            out = commit_sigma()
            _klog.info("keygen sigma commits done (%d)", len(out))
            return out

        sigma_coms = (
            commit_sigma_logged()
            if ckpt is None
            else ckpt.points("kg_sigma", commit_sigma_logged)
        )
        sigma_polys = None
    else:
        fixed_polys, fixed_coms = [], []
        for col in fixed_vals:
            evals = _to_mont_dev(col)
            coeffs = dom.intt(evals)
            fixed_polys.append(coeffs)
            fixed_coms.append(kzg_commit(srs, coeffs))

        sigma_polys, sigma_coms = [], []
        for j in range(len(sigma_vals)):
            coeffs = dom.intt(sigma_vals.col_mont(j))
            sigma_polys.append(coeffs)
            sigma_coms.append(kzg_commit(srs, coeffs))

    usable = cs.usable_rows(n)
    l0_vals = [1] + [0] * (n - 1)
    l_last_vals = [0] * n
    l_last_vals[usable - 1] = 1
    l_active = np.zeros(n, dtype=np.int64)
    l_active[: usable - 1] = 1  # rows where product-style gates apply

    vk = VerifyingKey(k, cs, fixed_coms, sigma_coms, dom)
    pk = ProvingKey(
        vk,
        fixed_polys,
        fixed_vals,
        sigma_polys,
        sigma_vals,
        l0=dom.intt(_to_mont_dev(l0_vals)),
        l_last=dom.intt(_to_mont_dev(l_last_vals)),
        l_active=l_active,
    )
    return pk, vk


def _build_next(cs: ConstraintSystem, n: int) -> np.ndarray:
    cols = {c: j for j, c in enumerate(cs.perm_columns)}
    m = len(cs.perm_columns)
    nxt = np.arange(m * n, dtype=np.int64)
    for (ca, ra), (cb, rb) in cs.copies:
        a = cols[ca] * n + ra
        b = cols[cb] * n + rb
        nxt[a], nxt[b] = nxt[b], nxt[a]
    return nxt


def _extended_j(cs: ConstraintSystem) -> int:
    d = max(cs.max_gate_degree(), 5)  # lookup/perm args reach degree ~5
    return max((d - 1).bit_length(), 1)

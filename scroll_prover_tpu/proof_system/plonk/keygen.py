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
    sigma_values: list[list[int]]
    l0: jnp.ndarray = None
    l_last: jnp.ndarray = None
    l_active: np.ndarray = None  # host 0/1 mask of active gate rows


def _sigma_values(nxt: np.ndarray, m: int, n: int) -> list[list[int]]:
    from ...fields.bn254 import FR_ROOT_OF_UNITY

    k = n.bit_length() - 1
    omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - k), FR_MOD)
    om_pows = [1] * n
    for i in range(1, n):
        om_pows[i] = om_pows[i - 1] * omega % FR_MOD
    delta_pows = [pow(DELTA, j, FR_MOD) for j in range(m)]
    out = []
    for j in range(m):
        col = []
        for i in range(n):
            t = int(nxt[j * n + i])
            cj, ci = divmod(t, n)
            col.append(delta_pows[cj] * om_pows[ci] % FR_MOD)
        out.append(col)
    return out


def keygen(srs: SRS, k: int, circuit: Circuit, instance=None):
    """Returns (pk, vk). Fixed columns come from a reference assignment with
    zero instance (fixed content must not depend on the witness)."""
    cs = ConstraintSystem()
    circuit.configure(cs)
    n = 1 << k
    dom = EvaluationDomain(k, _extended_j(cs))
    inst = np.empty((cs.num_instance, n), dtype=object)
    inst[:] = 0
    tables = circuit.assign(cs, n, inst)
    fixed_vals = [tables["fixed"][i] for i in range(cs.num_fixed)]

    lowmem = os.environ.get("SPT_LOWMEM") == "1"
    sigma_vals = _sigma_values(_build_next(cs, n), len(cs.perm_columns), n)
    if lowmem:
        # commit straight from values over the Lagrange-basis SRS (same
        # points — same polynomial, different basis) and defer the coeff
        # forms to the first prove(), which converts them consume-as-you-go
        # after its value tables are released: at k=20 a 200-column circuit
        # holds ~7 GB/form, and keygen must not leave both resident
        from ..kzg import kzg_commit_batch

        def commit_vals(cols):
            out = []
            for i in range(0, len(cols), 8):
                grp = [_to_mont_dev(c) for c in cols[i : i + 8]]
                out.extend(kzg_commit_batch(srs, grp, basis="lagrange"))
                del grp
            return out

        fixed_polys, fixed_coms = None, commit_vals(fixed_vals)
        sigma_polys, sigma_coms = None, commit_vals(sigma_vals)
    else:
        fixed_polys, fixed_coms = [], []
        for col in fixed_vals:
            evals = _to_mont_dev(col)
            coeffs = dom.intt(evals)
            fixed_polys.append(coeffs)
            fixed_coms.append(kzg_commit(srs, coeffs))

        sigma_polys, sigma_coms = [], []
        for col in sigma_vals:
            coeffs = dom.intt(_to_mont_dev(col))
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

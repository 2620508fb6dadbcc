"""Distributed four-step NTT over a device mesh.

Decomposes an N = N1*N2 point NTT into row NTTs, a twiddle multiply, one
all-to-all resharding over the mesh (the only inter-chip exchange), and
column NTTs. This replaces the butterfly-stage data movement of a monolithic
radix-2 NTT with a single bulk ICI collective, which is the right shape for
TPU (few large transfers, local compute between them).

Index math (w = primitive N-th root of unity):
    n = n1 + N1*n2      (n1 in [N1], n2 in [N2])
    k = k2 + N2*k1      (k1 in [N1], k2 in [N2])
    X[k2 + N2*k1] = sum_{n1} w^{n1*(k2 + N2*k1)} *
                    sum_{n2} (w^{N1})^{n2*k2} * x[n1 + N1*n2]
      = ColNTT_{N1}( w^{n1*k2} * RowNTT_{N2}(x matrix) )

Capability parity: the reference runs monolithic rayon radix-2 FFTs to 2^26
inside one address space (SURVEY.md L1, section 5 "Long-context"); 2^26 limbs
do not fit one chip's HBM alongside the rest of the prover state, so the
sharded path is how degree-26 quotient NTTs run at all on TPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map

from ..fields.limbs import N_LIMBS, LimbField, ints_to_limbs
from ..ops import field_ops as fo
from ..ops.ntt import EvaluationDomain, _bitrev_indices, _ntt_dif, _powers_mont
from .mesh import SHARD_AXIS


def _batched_ntt(f: LimbField, rows, tw, bitrev):
    """Row-wise natural-order NTT: rows (r, n, L) -> (r, n, L)."""
    y = jax.vmap(lambda v: _ntt_dif(f, v, tw))(rows)
    return jnp.take(y, bitrev, axis=1)


class ShardedDomain:
    """Four-step NTT plan for size 2^k split as N1=2^k1 rows x N2 cols.

    Rows (n1) are sharded over the mesh axis; the all-to-all moves the
    matrix from row-sharded to column-sharded between the two NTT phases.
    """

    def __init__(self, domain: EvaluationDomain, mesh, k1: int | None = None):
        self.domain = domain
        self.mesh = mesh
        self.axis = SHARD_AXIS
        d = mesh.devices.size
        self.n_dev = d
        k = domain.k
        if k1 is None:
            k1 = max((k + 1) // 2, (d - 1).bit_length())
        assert (1 << k1) % d == 0, "N1 must divide evenly across devices"
        self.k1, self.k2 = k1, k - k1
        self.n1, self.n2 = 1 << k1, 1 << (k - k1)
        f = domain.field
        p = f.modulus
        w = domain.omega
        # local-phase tables (replicated)
        w_row = pow(w, self.n1, p)  # order N2
        w_col = pow(w, self.n2, p)  # order N1
        self.tw_row = jnp.asarray(_powers_mont(f, w_row, max(self.n2 // 2, 1)))
        self.tw_col = jnp.asarray(_powers_mont(f, w_col, max(self.n1 // 2, 1)))
        self.br_row = jnp.asarray(_bitrev_indices(self.n2))
        self.br_col = jnp.asarray(_bitrev_indices(self.n1))
        # inter-phase twiddle w^(n1*k2): (N1, N2, L), built row-sharded on host
        rows = []
        for n1 in range(self.n1):
            base = pow(w, n1, p)
            acc, vals = 1, []
            for _ in range(self.n2):
                vals.append(acc * (1 << 256) % p)
                acc = acc * base % p
            rows.append(ints_to_limbs(vals))
        tw_mid = np.stack(rows)  # (N1, N2, L)
        self.tw_mid = jax.device_put(
            tw_mid, NamedSharding(mesh, P(self.axis, None, None))
        )
        self._fn = None

    def _build(self):
        f = self.domain.field
        n1, n2, d = self.n1, self.n2, self.n_dev
        tw_row, br_row = self.tw_row, self.br_row
        tw_col, br_col = self.tw_col, self.br_col
        axis = self.axis

        def local(mat, tw_mid):
            # mat: (n1/d, n2, L) block of the coefficient matrix
            a = _batched_ntt(f, mat, tw_row, br_row)          # row NTTs (len n2)
            a = fo.mont_mul(f, a, tw_mid)                     # twiddle
            # reshard: split columns, gather rows -> (n1, n2/d, L)
            a = jax.lax.all_to_all(a, axis, split_axis=1, concat_axis=0, tiled=True)
            a = jnp.swapaxes(a, 0, 1)                         # (n2/d, n1, L)
            a = _batched_ntt(f, a, tw_col, br_col)            # col NTTs (len n1)
            return jnp.swapaxes(a, 0, 1)                      # (n1, n2/d, L)

        sm = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(P(axis, None, None), P(axis, None, None)),
            out_specs=P(None, axis, None),
            # mont_mul's fori_loop carries start as unvarying zeros; skip the
            # varying-manual-axes check rather than restructure the field core
            check_vma=False,
        )
        return jax.jit(sm)

    def ntt(self, x):
        """x: (N, L) Montgomery coefficients (replicated or host) ->
        (N1, N2, L) evaluation matrix, column-sharded; element (k1, k2) is
        X[k2 + N2*k1], i.e. row-major flatten restores natural order."""
        mat = x.reshape(self.n2, self.n1, N_LIMBS).swapaxes(0, 1)  # (n1,n2,L)
        mat = jax.device_put(
            mat, NamedSharding(self.mesh, P(self.axis, None, None))
        )
        if self._fn is None:
            self._fn = self._build()
        return self._fn(mat, self.tw_mid)

    def ntt_flat(self, x):
        """Convenience: gather the sharded result to a replicated (N, L)."""
        return self.ntt(x).reshape(self.n1 * self.n2, N_LIMBS)

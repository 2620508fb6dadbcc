"""Number-theoretic transform over BN254 Fr on TPU.

Radix-2 decimation-in-frequency NTT on limb-plane vectors (n, N_LIMBS), all
stages expressed as reshaped vector butterflies (VPU-shaped, static shapes,
fully jit-able). A final bit-reversal gather restores natural order so that
rotations on the evaluation domain are cheap `jnp.roll`s (halo2 gate
expressions use rotations; see plonk/).

Replaces the reference's rayon-parallel radix-2 FFT inside the scroll halo2
fork (SURVEY.md section 2.2 `halo2_proofs`: "radix-2 NTT/iNTT + coset";
quotient construction at SURVEY.md section 3.1 runs NTTs at 2^20..2^26).
The distributed (multi-chip) four-step variant lives in parallel/ntt_sharded.

Conventions:
  * elements are in Montgomery form (ops/field_ops.py)
  * `EvaluationDomain(k, j)` mirrors halo2's EvaluationDomain: H of size
    2^k, extended domain of size 2^(k+j) on the coset zeta*H_ext, used for
    quotient-polynomial construction.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bn254 import FR_GENERATOR, FR_MOD, FR_ROOT_OF_UNITY, FR_TWO_ADICITY
from ..fields.limbs import FR_LIMB, N_LIMBS, LimbField, ints_to_limbs
from . import field_ops as fo


def _bitrev_indices(n: int) -> np.ndarray:
    k = n.bit_length() - 1
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(k):
        rev |= ((idx >> b) & 1) << (k - 1 - b)
    return rev


def _powers_mont(f: LimbField, base: int, n: int) -> np.ndarray:
    """[1, base, base^2, ..., base^(n-1)] in Montgomery limb form, (n, L)."""
    p = f.modulus
    vals = [0] * n
    acc = 1
    for i in range(n):
        vals[i] = acc * (1 << 256) % p  # to Montgomery
        acc = acc * base % p
    return ints_to_limbs(vals)


@partial(jax.jit, static_argnums=(0,))
def _ntt_dif(f: LimbField, x, tw):
    """DIF NTT: natural order in -> bit-reversed order out.

    tw: (n//2, L) Montgomery twiddles tw[j] = g^j for the n-th root g.

    The k stages run under a single lax.scan with a stage-independent trace:
    butterfly partners and twiddle positions are derived from the stage index
    with bit arithmetic, so XLA compiles exactly one stage body regardless of
    n (compile time was the bottleneck with per-stage unrolled graphs; a
    fused Pallas butterfly kernel is the planned next step for the TPU hot
    path).
    """
    n = x.shape[0]
    k = n.bit_length() - 1
    half_n = n // 2
    pair = jnp.arange(half_n, dtype=jnp.uint32)
    pos = jnp.arange(n, dtype=jnp.uint32)

    def stage(x, s):
        sh = jnp.uint32(k - 1) - s  # log2(half) for this stage
        j = pair & ((jnp.uint32(1) << sh) - 1)
        blk = pair >> sh
        iu = (blk << (sh + 1)) | j
        iw = iu | (jnp.uint32(1) << sh)
        u = jnp.take(x, iu, axis=0)
        w = jnp.take(x, iw, axis=0)
        s_ = fo.add_mod(f, u, w)
        d = fo.sub_mod(f, u, w)
        d = fo.mont_mul(f, d, jnp.take(tw, j << s, axis=0))
        # scatter-free recombine: output position q holds add-result of its
        # pair if bit `sh` of q is clear, else the twiddled difference
        y = jnp.concatenate([s_, d], axis=0)
        p_of_q = ((pos >> (sh + 1)) << sh) | (pos & ((jnp.uint32(1) << sh) - 1))
        is_w = (pos >> sh) & 1
        perm = p_of_q + is_w * jnp.uint32(half_n)
        return jnp.take(y, perm, axis=0), None

    x, _ = jax.lax.scan(stage, x, jnp.arange(k, dtype=jnp.uint32))
    return x


class EvaluationDomain:
    """NTT evaluation domain over Fr, with extended coset domain.

    Mirrors halo2's EvaluationDomain (SURVEY.md L1): size 2^k subgroup H for
    witness polynomials, size 2^(k+j) coset zeta*H_ext for the quotient.
    """

    def __init__(self, k: int, j: int = 0, field: LimbField = FR_LIMB):
        assert k + j <= FR_TWO_ADICITY
        self.field = field
        self.k = k
        self.j = j
        self.n = 1 << k
        p = field.modulus
        self.omega = pow(FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - k), p)
        self.omega_inv = pow(self.omega, -1, p)
        self.n_inv = pow(self.n, -1, p)
        # device tables (lazy)
        self._tables: dict[str, jnp.ndarray] = {}
        # extended domain
        self.extended_k = k + j
        self.extended_n = 1 << self.extended_k
        self.extended_omega = pow(
            FR_ROOT_OF_UNITY, 1 << (FR_TWO_ADICITY - self.extended_k), p
        )
        self.extended_omega_inv = pow(self.extended_omega, -1, p)
        self.extended_n_inv = pow(self.extended_n, -1, p)
        # coset generator (multiplicative generator of Fr*); halo2 uses ZETA,
        # any generator avoiding H works for a self-consistent system
        self.g_coset = FR_GENERATOR
        self.g_coset_inv = pow(FR_GENERATOR, -1, p)

    # --- backend dispatch -------------------------------------------------

    def _tiled(self, extended: bool):
        """Fused Pallas four-step engine (ops/ntt_tile.py) for large sizes.

        Used automatically on accelerator backends when the domain is at
        least 2^MIN_K; SPT_NTT_TILED=0 forces the scan path, =1 forces tiled.
        Only instantiated for Fr (the tile kernel's limb geometry).
        """
        import os

        key = "tiled_ext" if extended else "tiled"
        t = self._tables.get(key)
        if t is not None:
            return t
        if self.field is not FR_LIMB:
            self._tables[key] = False
            return False
        from .ntt_tile import TiledDomain

        k = self.extended_k if extended else self.k
        flag = os.environ.get("SPT_NTT_TILED", "auto")
        use = (
            flag != "0"
            and k >= TiledDomain.MIN_K
            and (flag == "1" or jax.default_backend() != "cpu")
        )
        t = TiledDomain(k) if use else False
        self._tables[key] = t
        return t

    # --- table management -----------------------------------------------

    def _table(self, name: str) -> jnp.ndarray:
        t = self._tables.get(name)
        if t is not None:
            return t
        f = self.field
        if name == "tw":
            t = jnp.asarray(_powers_mont(f, self.omega, self.n // 2))
        elif name == "tw_inv":
            t = jnp.asarray(_powers_mont(f, self.omega_inv, self.n // 2))
        elif name == "tw_ext":
            t = jnp.asarray(
                _powers_mont(f, self.extended_omega, self.extended_n // 2)
            )
        elif name == "tw_ext_inv":
            t = jnp.asarray(
                _powers_mont(f, self.extended_omega_inv, self.extended_n // 2)
            )
        elif name == "bitrev":
            t = jnp.asarray(_bitrev_indices(self.n))
        elif name == "bitrev_ext":
            t = jnp.asarray(_bitrev_indices(self.extended_n))
        elif name == "coset_pow":
            t = jnp.asarray(_powers_mont(f, self.g_coset, self.extended_n))
        elif name == "coset_pow_inv":
            t = jnp.asarray(_powers_mont(f, self.g_coset_inv, self.extended_n))
        else:  # pragma: no cover
            raise KeyError(name)
        self._tables[name] = t
        return t

    def _scalar_mont(self, v: int) -> jnp.ndarray:
        return jnp.asarray(
            ints_to_limbs([v * (1 << 256) % self.field.modulus])[0]
        )

    # --- transforms -------------------------------------------------------

    def ntt(self, x) -> jnp.ndarray:
        """Coefficients -> evaluations over H (natural order). x: (n, L) mont."""
        assert x.shape == (self.n, N_LIMBS)
        td = self._tiled(False)
        if td:
            return td.ntt(x)
        y = _ntt_dif(self.field, x, self._table("tw"))
        return jnp.take(y, self._table("bitrev"), axis=0)

    def intt(self, y) -> jnp.ndarray:
        """Evaluations over H -> coefficients."""
        assert y.shape == (self.n, N_LIMBS)
        td = self._tiled(False)
        if td:
            return td.intt(y)
        x = _ntt_dif(self.field, y, self._table("tw_inv"))
        x = jnp.take(x, self._table("bitrev"), axis=0)
        return fo.mont_mul(self.field, x, self._scalar_mont(self.n_inv)[None, :])

    def ntt_extended(self, x) -> jnp.ndarray:
        """Coefficients (padded to extended_n) -> evals over coset zeta*H_ext."""
        assert x.shape == (self.extended_n, N_LIMBS)
        # multiply coefficient i by g_coset^i, then plain NTT over H_ext
        # (mont_mul_big: the composed CIOS OOMs XLA's buffer assignment at
        # 2^23 rows — field_ops.BIG_MUL_ROWS)
        x = fo.mont_mul_big(self.field, x, self._table("coset_pow"))
        td = self._tiled(True)
        if td:
            return td.ntt(x)
        y = _ntt_dif(self.field, x, self._table("tw_ext"))
        return jnp.take(y, self._table("bitrev_ext"), axis=0)

    def intt_extended(self, y) -> jnp.ndarray:
        """Evals over coset zeta*H_ext -> coefficients."""
        assert y.shape == (self.extended_n, N_LIMBS)
        td = self._tiled(True)
        if td:
            x = td.intt(y)
        else:
            x = _ntt_dif(self.field, y, self._table("tw_ext_inv"))
            x = jnp.take(x, self._table("bitrev_ext"), axis=0)
            x = fo.mont_mul(
                self.field, x, self._scalar_mont(self.extended_n_inv)[None, :]
            )
        return fo.mont_mul_big(self.field, x, self._table("coset_pow_inv"))

    # --- batched transforms (many columns, one dispatch chain) ------------
    #
    # The prover transforms ~50 same-length columns per phase (advice,
    # lookup permuted columns, grand products, quotient extension — see
    # plonk/prover.py). Per-column dispatch over the tunneled backend costs
    # more than the math at production sizes (docs/PERF.md); these batch
    # entry points run C columns through ONE traced graph. x: (C, n, L).

    def ntt_batch(self, x) -> jnp.ndarray:
        assert x.ndim == 3 and x.shape[1] == self.n
        td = self._tiled(False)
        if td:
            return td.ntt_batch(x)
        y = jax.vmap(lambda v: _ntt_dif(self.field, v, self._table("tw")))(x)
        return jnp.take(y, self._table("bitrev"), axis=1)

    def intt_batch(self, y) -> jnp.ndarray:
        assert y.ndim == 3 and y.shape[1] == self.n
        td = self._tiled(False)
        if td:
            return td.intt_batch(y)
        x = jax.vmap(lambda v: _ntt_dif(self.field, v, self._table("tw_inv")))(y)
        x = jnp.take(x, self._table("bitrev"), axis=1)
        return fo.mont_mul(
            self.field, x, self._scalar_mont(self.n_inv)[None, None, :]
        )

    def ntt_extended_batch(self, x) -> jnp.ndarray:
        assert x.ndim == 3 and x.shape[1] == self.extended_n
        x = fo.mont_mul_big(
            self.field, x, jnp.broadcast_to(self._table("coset_pow")[None], x.shape)
        )
        td = self._tiled(True)
        if td:
            return td.ntt_batch(x)
        y = jax.vmap(lambda v: _ntt_dif(self.field, v, self._table("tw_ext")))(x)
        return jnp.take(y, self._table("bitrev_ext"), axis=1)

    def intt_extended_batch(self, y) -> jnp.ndarray:
        assert y.ndim == 3 and y.shape[1] == self.extended_n
        td = self._tiled(True)
        if td:
            x = td.intt_batch(y)
        else:
            x = jax.vmap(
                lambda v: _ntt_dif(self.field, v, self._table("tw_ext_inv"))
            )(y)
            x = jnp.take(x, self._table("bitrev_ext"), axis=1)
            x = fo.mont_mul(
                self.field, x,
                self._scalar_mont(self.extended_n_inv)[None, None, :],
            )
        return fo.mont_mul_big(
            self.field, x,
            jnp.broadcast_to(self._table("coset_pow_inv")[None], x.shape),
        )

    # --- host-side helpers (testing / verifier) ---------------------------

    def omega_powers(self, n: int | None = None) -> list[int]:
        p = self.field.modulus
        out, acc = [], 1
        for _ in range(n or self.n):
            out.append(acc)
            acc = acc * self.omega % p
        return out

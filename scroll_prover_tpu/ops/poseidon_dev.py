"""Device Poseidon: batched permutation over Fr limb planes.

The host Poseidon (hashes/poseidon.py) is fine for transcripts (single
states); witness generation hashes many trie nodes / code chunks at once —
that's this kernel's job (SURVEY.md section 2.2: "Pallas Poseidon kernel
(hot: transcript + trie)"). Implementation: the 65 rounds run under a
lax.scan whose body is one traced round (x^5 S-box via three mont muls, 3x3
MDS as nine muls), vectorized over the batch axis; the round-constant
stream and a full/partial mask ride the scan.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.bn254 import FR_MOD
from ..fields.limbs import FR_LIMB, N_LIMBS, ints_to_limbs
from ..hashes.poseidon import poseidon_fr
from . import field_ops as fo

F = FR_LIMB


def _mont(vals) -> np.ndarray:
    return ints_to_limbs([int(v) * (1 << 256) % FR_MOD for v in vals])


class PoseidonDev:
    """Batched t=3 Poseidon permutation on device."""

    def __init__(self):
        h = poseidon_fr
        self.h = h
        rounds = h.r_f + h.r_p
        self.rc = jnp.asarray(
            np.stack([_mont(h.rc[r]) for r in range(rounds)])
        )  # (rounds, 3, L)
        self.mds = jnp.asarray(np.stack([_mont(row) for row in h.mds]))  # (3,3,L)
        half = h.r_f // 2
        full_mask = [1] * half + [0] * h.r_p + [1] * half
        self.full = jnp.asarray(np.array(full_mask, dtype=np.uint32))
        self._perm = jax.jit(self._permute)

    def _sbox(self, x):
        x2 = fo.mont_mul(F, x, x)
        x4 = fo.mont_mul(F, x2, x2)
        return fo.mont_mul(F, x4, x)

    def _permute(self, state):
        """state: (n, 3, L) Montgomery -> (n, 3, L)."""
        mds = self.mds

        def body(s, inp):
            rc, full = inp
            s = fo.add_mod(F, s, jnp.broadcast_to(rc[None], s.shape))
            sb = self._sbox(s)
            # partial rounds S-box only lane 0
            keep = jnp.concatenate(
                [sb[:, :1], jnp.where(full > 0, sb[:, 1:], s[:, 1:])], axis=1
            )
            # MDS: out_i = sum_j mds[i][j] * keep_j
            outs = []
            for i in range(3):
                acc = fo.mont_mul(F, jnp.broadcast_to(mds[i, 0][None], keep[:, 0].shape), keep[:, 0])
                for j in (1, 2):
                    acc = fo.add_mod(
                        F, acc,
                        fo.mont_mul(F, jnp.broadcast_to(mds[i, j][None], keep[:, j].shape), keep[:, j]),
                    )
                outs.append(acc)
            return jnp.stack(outs, axis=1), None

        out, _ = jax.lax.scan(body, state, (self.rc, self.full))
        return out

    def hash2_batch(self, a_vals: list[int], b_vals: list[int], domain: int = 0) -> list[int]:
        """Batched hash2: permute([a, b, domain])[0] per row; host int io."""
        n = len(a_vals)
        state = np.stack(
            [
                _mont(a_vals),
                _mont(b_vals),
                _mont([domain] * n),
            ],
            axis=1,
        )  # (n, 3, L)
        out = self._perm(jnp.asarray(state))
        return F.decode(np.asarray(out[:, 0]))

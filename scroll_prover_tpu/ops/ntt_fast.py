"""Fast single-chip NTT: Pallas butterfly kernel, XLA-staged.

The monolithic scan NTT (ops/ntt.py) runs ~6% of VPU peak: its per-stage
gathers and fori_loop Montgomery innerloops lower poorly. This path keeps
the radix-2 DIF structure but executes each stage's butterflies in ONE
Pallas kernel whose body is fully unrolled lazy-carry limb arithmetic (no
gathers, no dynamic indexing), at the SAME shape every stage:

  stage s: view x as (blocks, 2, half, L); u/w flatten to (n/2, L);
  tw_flat[i] = tw[(i * 2^s) mod n/2]  (one XLA gather per stage);
  kernel: s_ = u + w;  d = (u - w) * tw  -> stacked back by XLA.

One kernel compile serves all stages and sizes with the same tile. The
bit-reversal is a single XLA gather at the end. (A fused multi-stage VMEM
kernel OOMed the Mosaic compiler at T=1024; this staged form trades one
HBM round-trip per stage for tiny kernels — still ~10x less instruction
overhead than the scan path.)

Kernel rules followed per /opt/skills/guides/pallas_guide.md: no captured
array constants (modulus rides in as an input), static shapes, unrolled
limb loops.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ..fields.bn254 import FR_MOD
from ..fields.limbs import FR_LIMB, N_LIMBS
from .ntt import EvaluationDomain, _bitrev_indices, _powers_mont

F = FR_LIMB
TILE = 1 << 12  # butterfly rows per program: ~1.5 MB of VMEM in-flight

_MASK16 = np.uint32(0xFFFF)
_N0INV = np.uint32(F.n0inv)


# --- kernel-local limb arithmetic (Mosaic: no captured array constants) ---


def _k_sub_raw(a, b):
    out = []
    brw = jnp.zeros(a.shape[:-1], jnp.uint32)
    for j in range(N_LIMBS):
        d = a[..., j] - b[..., j] - brw
        brw = d >> 31
        out.append(d & _MASK16)
    return jnp.stack(out, axis=-1), brw


def _k_cond_sub(p, t, extra):
    d, brw = _k_sub_raw(t, jnp.broadcast_to(p, t.shape))
    take = (extra > 0) | (brw == 0)
    return jnp.where(take[..., None], d, t)


def _k_add(p, a, b):
    out = []
    c = jnp.zeros(a.shape[:-1], jnp.uint32)
    for j in range(N_LIMBS):
        s = a[..., j] + b[..., j] + c
        out.append(s & _MASK16)
        c = s >> 16
    return _k_cond_sub(p, jnp.stack(out, axis=-1), c)


def _k_sub(p, a, b):
    d, brw = _k_sub_raw(a, b)
    pb = jnp.broadcast_to(p, a.shape)
    out = []
    c = jnp.zeros(a.shape[:-1], jnp.uint32)
    for j in range(N_LIMBS):
        s = d[..., j] + pb[..., j] + c
        out.append(s & _MASK16)
        c = s >> 16
    dp = jnp.stack(out, axis=-1)
    return jnp.where((brw > 0)[..., None], dp, d)


def _k_mont_mul(p, a, b):
    """Unrolled lazy-carry Montgomery product (see field_ops.mont_mul)."""
    L = N_LIMBS
    shape = a.shape[:-1]
    t = [jnp.zeros(shape, jnp.uint32) for _ in range(2 * L)]
    for i in range(L):
        ai = a[..., i]
        for j in range(L):
            prod = ai * b[..., j]
            t[i + j] = t[i + j] + (prod & _MASK16)
            t[i + j + 1] = t[i + j + 1] + (prod >> 16)
    c = jnp.zeros(shape, jnp.uint32)
    for i in range(L):
        ti = t[i] + c
        m = (ti * _N0INV) & _MASK16
        for j in range(L):
            prod = m * p[..., j]
            t[i + j] = t[i + j] + (prod & _MASK16)
            if i + j + 1 < 2 * L:
                t[i + j + 1] = t[i + j + 1] + (prod >> 16)
        c = (t[i] + c) >> 16
    res = t[L : 2 * L]
    res[0] = res[0] + c
    out = []
    cc = jnp.zeros(shape, jnp.uint32)
    for j in range(L):
        s = res[j] + cc
        out.append(s & _MASK16)
        cc = s >> 16
    return _k_cond_sub(p, jnp.stack(out, axis=-1), cc)


def _butterfly_kernel(u_ref, w_ref, tw_ref, p_ref, s_ref, d_ref):
    u = u_ref[...]
    w = w_ref[...]
    tw = tw_ref[...]
    p = p_ref[...]
    s_ref[...] = _k_add(p, u, w)
    d_ref[...] = _k_mont_mul(p, _k_sub(p, u, w), tw)


def butterfly(u, w, tw, interpret: bool = False):
    """(m, L) x3 -> (s_, d): the DIF butterfly, tiled over m."""
    m, L = u.shape
    tile = min(TILE, m)
    assert m % tile == 0
    return pl.pallas_call(
        _butterfly_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((m, L), u.dtype),
            jax.ShapeDtypeStruct((m, L), u.dtype),
        ),
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((L,), lambda i: (0,)),
        ],
        out_specs=(
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
            pl.BlockSpec((tile, L), lambda i: (i, 0)),
        ),
        interpret=interpret,
    )(u, w, tw, jnp.asarray(F.p_limbs, dtype=jnp.uint32))


class FastDomain:
    """Full-size staged NTT for 2^k (Pallas butterflies, XLA glue)."""

    def __init__(self, k: int, interpret: bool = False):
        self.k = k
        self.n = 1 << k
        self.interpret = interpret
        self.domain = EvaluationDomain(k)
        self.tw = jnp.asarray(_powers_mont(F, self.domain.omega, self.n // 2))
        self.br = jnp.asarray(_bitrev_indices(self.n).astype(np.int32))
        self._fn = None

    def _build(self):
        n, k = self.n, self.k
        nh = n // 2
        interp = self.interpret
        idx = jnp.arange(nh, dtype=jnp.uint32)

        def run(x, tw, br):
            for s in range(k):
                half = n >> (s + 1)
                blocks = 1 << s
                arr = x.reshape(blocks, 2, half, N_LIMBS)
                u = arr[:, 0].reshape(nh, N_LIMBS)
                w = arr[:, 1].reshape(nh, N_LIMBS)
                tw_s = jnp.take(tw, (idx << s) & jnp.uint32(nh - 1), axis=0)
                s_, d = butterfly(u, w, tw_s, interp)
                x = jnp.stack(
                    [s_.reshape(blocks, half, N_LIMBS), d.reshape(blocks, half, N_LIMBS)],
                    axis=1,
                ).reshape(n, N_LIMBS)
            return jnp.take(x, br, axis=0)

        return jax.jit(run)

    def ntt(self, x: jnp.ndarray) -> jnp.ndarray:
        """(n, L) Montgomery coefficients -> natural-order evals."""
        if self._fn is None:
            self._fn = self._build()
        return self._fn(x, self.tw, self.br)

"""Fast single-chip NTT: Pallas butterfly kernel, limb-major layout.

The monolithic scan NTT (ops/ntt.py) runs at ~6% of VPU peak: per-stage
gathers, fori_loop Montgomery inner loops, and an element-major (n, 16)
layout whose 16-wide minor dim wastes 7/8 of every 128-lane vreg. This path
fixes all three:

  * data lives LIMB-MAJOR (16, n): the big axis rides the lanes, each limb
    is a sublane row — the natural TPU layout for limb-plane bigints;
  * each radix-2 DIF stage is one small Pallas kernel (fully unrolled
    lazy-carry Montgomery arithmetic, no gathers, no dynamic indexing) at
    the SAME block shape every stage -> one Mosaic compile;
  * XLA does the between-stage reshapes and the two boundary transposes
    ((n, L) API form <-> (L, n) kernel form) plus the final bit-reversal.

Kernel rules per /opt/skills/guides/pallas_guide.md: no captured array
constants (modulus rides in as an input), static shapes, minor dim large.
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
TILE = 1 << 13  # butterfly lanes per program

_MASK16 = np.uint32(0xFFFF)
_N0INV = np.uint32(F.n0inv)


# --- kernel-local limb-major arithmetic (rows = limbs, lanes = elements) ---


def _km_sub_raw(a, b):
    out = []
    brw = jnp.zeros(a[0].shape, jnp.uint32)
    for j in range(N_LIMBS):
        d = a[j] - b[j] - brw
        brw = d >> 31
        out.append(d & _MASK16)
    return out, brw


def _km_select(cond, a_rows, b_rows):
    return [jnp.where(cond, x, y) for x, y in zip(a_rows, b_rows)]


def _km_cond_sub(p_rows, t_rows, extra):
    d, brw = _km_sub_raw(t_rows, [jnp.broadcast_to(pr, t_rows[0].shape) for pr in p_rows])
    take = (extra > 0) | (brw == 0)
    return _km_select(take, d, t_rows)


def _km_add(p_rows, a, b):
    out = []
    c = jnp.zeros(a[0].shape, jnp.uint32)
    for j in range(N_LIMBS):
        s = a[j] + b[j] + c
        out.append(s & _MASK16)
        c = s >> 16
    return _km_cond_sub(p_rows, out, c)


def _km_sub(p_rows, a, b):
    d, brw = _km_sub_raw(a, b)
    out = []
    c = jnp.zeros(a[0].shape, jnp.uint32)
    for j in range(N_LIMBS):
        s = d[j] + p_rows[j] + c
        out.append(s & _MASK16)
        c = s >> 16
    return _km_select(brw > 0, out, d)


def _km_mont_mul(p_rows, a, b):
    """Unrolled lazy-carry Montgomery product on limb rows."""
    L = N_LIMBS
    shape = a[0].shape
    t = [jnp.zeros(shape, jnp.uint32) for _ in range(2 * L)]
    for i in range(L):
        ai = a[i]
        for j in range(L):
            prod = ai * b[j]
            t[i + j] = t[i + j] + (prod & _MASK16)
            t[i + j + 1] = t[i + j + 1] + (prod >> 16)
    c = jnp.zeros(shape, jnp.uint32)
    for i in range(L):
        ti = t[i] + c
        m = (ti * _N0INV) & _MASK16
        for j in range(L):
            prod = m * p_rows[j]
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
    return _km_cond_sub(p_rows, out, cc)


def _butterfly4_kernel(
    v0_ref, v1_ref, v2_ref, v3_ref, ta_ref, tb_ref, tc_ref, p_ref,
    y0_ref, y1_ref, y2_ref, y3_ref,
):
    """Radix-4: two fused DIF levels. Inputs are the four quarter-planes of
    each block; ta/tb are the first-level twiddles for the (0,2)/(1,3)
    pairs, tc the second-level twiddle."""
    v = [[r[j] for j in range(N_LIMBS)] for r in (v0_ref, v1_ref, v2_ref, v3_ref)]
    ta = [ta_ref[j] for j in range(N_LIMBS)]
    tb = [tb_ref[j] for j in range(N_LIMBS)]
    tc = [tc_ref[j] for j in range(N_LIMBS)]
    p = [p_ref[j, 0] for j in range(N_LIMBS)]
    # level 1: pairs (0,2) and (1,3)
    s0 = _km_add(p, v[0], v[2])
    d0 = _km_mont_mul(p, _km_sub(p, v[0], v[2]), ta)
    s1 = _km_add(p, v[1], v[3])
    d1 = _km_mont_mul(p, _km_sub(p, v[1], v[3]), tb)
    # level 2: pairs (s0,s1) and (d0,d1), same twiddle
    y0 = _km_add(p, s0, s1)
    y1 = _km_mont_mul(p, _km_sub(p, s0, s1), tc)
    y2 = _km_add(p, d0, d1)
    y3 = _km_mont_mul(p, _km_sub(p, d0, d1), tc)
    for j in range(N_LIMBS):
        y0_ref[j] = y0[j]
        y1_ref[j] = y1[j]
        y2_ref[j] = y2[j]
        y3_ref[j] = y3[j]


def butterfly4_t(v0, v1, v2, v3, ta, tb, tc, interpret: bool = False):
    """Limb-major radix-4 butterfly: 4x (L, m) + 3 twiddles -> 4 outputs."""
    L, m = v0.shape
    tile = min(TILE, m)
    assert m % tile == 0
    bs = pl.BlockSpec((L, tile), lambda i: (0, i))
    return pl.pallas_call(
        _butterfly4_kernel,
        out_shape=tuple(jax.ShapeDtypeStruct((L, m), v0.dtype) for _ in range(4)),
        grid=(m // tile,),
        in_specs=[bs] * 7 + [pl.BlockSpec((L, 1), lambda i: (0, 0))],
        out_specs=(bs, bs, bs, bs),
        interpret=interpret,
    )(v0, v1, v2, v3, ta, tb, tc, jnp.asarray(F.p_limbs, dtype=jnp.uint32)[:, None])


def _butterfly_kernel(u_ref, w_ref, tw_ref, p_ref, s_ref, d_ref):
    u = [u_ref[j] for j in range(N_LIMBS)]
    w = [w_ref[j] for j in range(N_LIMBS)]
    tw = [tw_ref[j] for j in range(N_LIMBS)]
    p = [p_ref[j, 0] for j in range(N_LIMBS)]
    s_rows = _km_add(p, u, w)
    d_rows = _km_mont_mul(p, _km_sub(p, u, w), tw)
    for j in range(N_LIMBS):
        s_ref[j] = s_rows[j]
        d_ref[j] = d_rows[j]


def butterfly_t(u, w, tw, interpret: bool = False):
    """Limb-major butterfly: (L, m) x3 -> (s_, d), tiled along lanes."""
    L, m = u.shape
    tile = min(TILE, m)
    assert m % tile == 0
    return pl.pallas_call(
        _butterfly_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((L, m), u.dtype),
            jax.ShapeDtypeStruct((L, m), u.dtype),
        ),
        grid=(m // tile,),
        in_specs=[
            pl.BlockSpec((L, tile), lambda i: (0, i)),
            pl.BlockSpec((L, tile), lambda i: (0, i)),
            pl.BlockSpec((L, tile), lambda i: (0, i)),
            pl.BlockSpec((L, 1), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((L, tile), lambda i: (0, i)),
            pl.BlockSpec((L, tile), lambda i: (0, i)),
        ),
        interpret=interpret,
    )(u, w, tw, jnp.asarray(F.p_limbs, dtype=jnp.uint32)[:, None])


class FastDomain:
    """Full-size staged NTT for 2^k (Pallas butterflies, limb-major)."""

    def __init__(self, k: int, interpret: bool = False):
        self.k = k
        self.n = 1 << k
        self.interpret = interpret
        self.domain = EvaluationDomain(k)
        # twiddles kept limb-major (L, n/2)
        self.tw = jnp.asarray(_powers_mont(F, self.domain.omega, self.n // 2)).T.copy()
        self.br = jnp.asarray(_bitrev_indices(self.n).astype(np.int32))
        self._fn = None

    def _build(self):
        n, k = self.n, self.k
        nh = n // 2
        interp = self.interpret
        idx = jnp.arange(nh, dtype=jnp.uint32)

        nq = n // 4
        idx4 = jnp.arange(nq, dtype=jnp.uint32)

        def stage(s: int, x, tw):
            # x: (L, n) limb-major
            half = n >> (s + 1)
            blocks = 1 << s
            arr = x.reshape(N_LIMBS, blocks, 2, half)
            u = arr[:, :, 0].reshape(N_LIMBS, nh)
            w = arr[:, :, 1].reshape(N_LIMBS, nh)
            tw_s = jnp.take(tw, (idx << s) & jnp.uint32(nh - 1), axis=1)
            s_, d = butterfly_t(u, w, tw_s, interp)
            return jnp.stack(
                [s_.reshape(N_LIMBS, blocks, half), d.reshape(N_LIMBS, blocks, half)],
                axis=2,
            ).reshape(N_LIMBS, n)

        def stage4(s: int, x, tw):
            # fused stages s and s+1
            q = n >> (s + 2)
            blocks = 1 << s
            arr = x.reshape(N_LIMBS, blocks, 4, q)
            vs = [arr[:, :, i].reshape(N_LIMBS, nq) for i in range(4)]
            jp = idx4 & jnp.uint32(q - 1)  # j' within block
            ta = jnp.take(tw, (jp << s) & jnp.uint32(nh - 1), axis=1)
            tb = jnp.take(tw, ((jp + jnp.uint32(q)) << s) & jnp.uint32(nh - 1), axis=1)
            tc = jnp.take(tw, (jp << (s + 1)) & jnp.uint32(nh - 1), axis=1)
            ys = butterfly4_t(*vs, ta, tb, tc, interp)
            return jnp.stack(
                [y.reshape(N_LIMBS, blocks, q) for y in ys], axis=2
            ).reshape(N_LIMBS, n)

        stages = []
        s = 0
        # radix-4 fusion halves kernel dispatches but currently fails the
        # remote Mosaic compile (tpu_compile_helper exit 1) — opt-in via
        # SPT_NTT_RADIX4=1 for debugging; radix-2 is the proven default
        import os as _os

        use_r4 = (not interp) and bool(_os.environ.get("SPT_NTT_RADIX4"))
        while s < k:
            if use_r4 and s + 1 < k:
                stages.append(jax.jit(lambda x, tw, _s=s: stage4(_s, x, tw)))
                s += 2
            else:
                stages.append(jax.jit(lambda x, tw, _s=s: stage(_s, x, tw)))
                s += 1
        pre = jax.jit(lambda x: x.T.copy())           # (n, L) -> (L, n)
        post = jax.jit(lambda x, br: jnp.take(x, br, axis=1).T.copy())
        return stages, pre, post

    def ntt(self, x: jnp.ndarray) -> jnp.ndarray:
        """(n, L) Montgomery coefficients -> natural-order evals (n, L)."""
        if self._fn is None:
            self._fn = self._build()
        stages, pre, post = self._fn
        y = pre(x)
        for f in stages:
            y = f(y, self.tw)
        return post(y, self.br)

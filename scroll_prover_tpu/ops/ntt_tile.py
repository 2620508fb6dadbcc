"""Tiled four-step NTT: fused VMEM-resident Pallas batch kernel.

Replaces the per-stage butterfly pipeline (ops/ntt_fast.py) whose 20 kernel
dispatches + per-stage twiddle gathers dominated 2^20 wall-clock (149 ms
measured; gathers alone 56 ms). Design per /opt/skills/guides/pallas_guide.md:

  * recursive four-step split n = n1 * n2 with n2 = 2^KMAX rows: the whole
    length-256 batched NTT (8 radix-2 DIF stages) runs inside ONE Pallas
    kernel per pass, entirely in VMEM — no HBM traffic between stages, no
    twiddle gathers (per-stage twiddles are static slices of a packed
    (L, m) table resident in VMEM);
  * layout (L, m, T): limbs lead, the NTT axis rides the sublanes, a
    128-wide batch tile rides the lanes (full VPU width); blocks are 2 MB
    so in+out double-buffering fits the ~16 MB VMEM budget;
  * each level's inter-phase twiddle multiply is a flat limb-major Pallas
    elementwise Montgomery mul streamed over HBM;
  * every kernel output stays digit-reversed; ONE global gather at the end
    applies the composed permutation (host-precomputed), replacing per-stage
    bit-reversals.

Capability anchor: halo2's best_fft as consumed by the reference prover
(SURVEY.md section 3.1 hot path; reference inner circuits prove at 2^20,
/root/reference/README.md:21).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..fields.limbs import FR_LIMB, N_LIMBS, LimbField, ints_to_limbs
from .ntt import EvaluationDomain

F = FR_LIMB
KMAX = 8  # kernel handles NTTs of length <= 2^KMAX fully in VMEM
LANE_T = 128  # batch tile on the lane axis

_MASK16 = np.uint32(0xFFFF)
_N0INV = np.uint32(F.n0inv)


# --- kernel-local limb-list arithmetic (same math as ntt_fast, shapes free) --


def _kl_sub_raw(a, b):
    out = []
    brw = jnp.zeros(jnp.broadcast_shapes(a[0].shape, b[0].shape), jnp.uint32)
    for j in range(N_LIMBS):
        d = a[j] - b[j] - brw
        brw = d >> 31
        out.append(d & _MASK16)
    return out, brw


def _kl_select(cond, a, b):
    return [jnp.where(cond, x, y) for x, y in zip(a, b)]


def _kl_cond_sub(p, t, extra):
    d, brw = _kl_sub_raw(t, [jnp.broadcast_to(pr, t[0].shape) for pr in p])
    take = (extra > 0) | (brw == 0)
    return _kl_select(take, d, t)


def _kl_add(p, a, b):
    out = []
    c = jnp.zeros(a[0].shape, jnp.uint32)
    for j in range(N_LIMBS):
        s = a[j] + b[j] + c
        out.append(s & _MASK16)
        c = s >> 16
    return _kl_cond_sub(p, out, c)


def _kl_sub(p, a, b):
    d, brw = _kl_sub_raw(a, b)
    out = []
    c = jnp.zeros(d[0].shape, jnp.uint32)
    for j in range(N_LIMBS):
        s = d[j] + p[j] + c
        out.append(s & _MASK16)
        c = s >> 16
    return _kl_select(brw > 0, out, d)


def _kl_mont_mul(p, a, b):
    """Lazy-carry CIOS Montgomery product; b limbs may broadcast."""
    L = N_LIMBS
    shape = jnp.broadcast_shapes(a[0].shape, b[0].shape)
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
            prod = m * p[j]
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
    return _kl_cond_sub(p, out, cc)


# --- fused batched-NTT kernel ------------------------------------------------


def _bntt_kernel(x_ref, tw_ref, p_ref, o_ref, *, k: int):
    """All k stages of a 2^k-point NTT on a (L, m, T) tile, constant
    geometry (Pease): every stage pairs v[i] with v[i + m/2] and writes the
    (sum, twiddled diff) interleaved, so ONE traced fori_loop body serves
    all stages (small VMEM live set; the naive unrolled-stage version hit a
    33 MB scoped-vmem OOM). tw_ref: (k, L, m/2) per-stage Pease twiddles.
    Output is bit-reversed along the m axis.
    """
    m = 1 << k
    h = m // 2
    p = [p_ref[l, 0] for l in range(N_LIMBS)]

    def body(s, v):
        tws = tw_ref[s]  # (L, h)
        u = [v[l][:h] for l in range(N_LIMBS)]
        w = [v[l][h:] for l in range(N_LIMBS)]
        tw = [tws[l][:, None] for l in range(N_LIMBS)]
        s_ = _kl_add(p, u, w)
        d = _kl_mont_mul(p, _kl_sub(p, u, w), tw)
        return tuple(
            jnp.stack([s_[l], d[l]], axis=1).reshape(v[l].shape)
            for l in range(N_LIMBS)
        )

    v = jax.lax.fori_loop(
        0, k, body, tuple(x_ref[l] for l in range(N_LIMBS))
    )
    for l in range(N_LIMBS):
        o_ref[l] = v[l]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _bntt(v, twpease, k: int, interpret: bool = False):
    """v: (L, B, m) -> (L, B, m), NTT along the last axis, bit-reversed out."""
    L, B, m = v.shape
    assert m == 1 << k
    vt = v.swapaxes(1, 2)  # (L, m, B)
    T = min(LANE_T, B)
    assert B % T == 0
    bs = pl.BlockSpec((L, m, T), lambda i: (0, 0, i))
    out = pl.pallas_call(
        functools.partial(_bntt_kernel, k=k),
        out_shape=jax.ShapeDtypeStruct((L, m, B), jnp.uint32),
        grid=(B // T,),
        in_specs=[
            bs,
            pl.BlockSpec((k, L, m // 2), lambda i: (0, 0, 0)),
            pl.BlockSpec((L, 1), lambda i: (0, 0)),
        ],
        out_specs=bs,
        interpret=interpret,
        compiler_params=None
        if interpret
        else pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(vt, twpease, _p_col())
    return out.swapaxes(1, 2)


def _mul_kernel(a_ref, b_ref, p_ref, o_ref):
    a = [a_ref[l] for l in range(N_LIMBS)]
    b = [b_ref[l] for l in range(N_LIMBS)]
    p = [p_ref[l, 0] for l in range(N_LIMBS)]
    out = _kl_mont_mul(p, a, b)
    for l in range(N_LIMBS):
        o_ref[l] = out[l]


@functools.partial(jax.jit, static_argnames=("interpret",))
def lm_mul(a, b, interpret: bool = False):
    """Flat limb-major Montgomery mul: (L, N) * (L, N) -> (L, N)."""
    L, N = a.shape
    tile = min(1 << 13, N)
    assert N % tile == 0
    bs = pl.BlockSpec((L, tile), lambda i: (0, i))
    return pl.pallas_call(
        _mul_kernel,
        out_shape=jax.ShapeDtypeStruct((L, N), jnp.uint32),
        grid=(N // tile,),
        in_specs=[bs, bs, pl.BlockSpec((L, 1), lambda i: (0, 0))],
        out_specs=bs,
        interpret=interpret,
    )(a, b, _p_col())


_P_COL = np.ascontiguousarray(np.asarray(F.p_limbs, dtype=np.uint32)[:, None])


def _p_col():
    return jnp.asarray(_P_COL)


# --- host-side tables and plan ----------------------------------------------


def _bitrev(k: int) -> np.ndarray:
    n = 1 << k
    idx = np.arange(n, dtype=np.int64)
    out = np.zeros(n, dtype=np.int64)
    for b in range(k):
        out |= ((idx >> b) & 1) << (k - 1 - b)
    return out


def _stored_perm(k: int) -> np.ndarray:
    """Natural index -> stored index after the digit-reversed recursion."""
    if k <= KMAX:
        return _bitrev(k)
    k2 = KMAX
    k1 = k - k2
    n1, n2 = 1 << k1, 1 << k2
    sub = _stored_perm(k1)
    r2 = _bitrev(k2)
    kk = np.arange(1 << k, dtype=np.int64)
    hi, lo = kk >> k2, kk & (n2 - 1)  # k = n2*k1 + k2
    return sub[hi] * n2 + r2[lo]


def _pow_table_mont(f: LimbField, w: int, n: int) -> np.ndarray:
    """(n, L) standard->Montgomery limb table of w^0..w^(n-1)."""
    p = f.modulus
    r = (1 << 256) % p
    vals = np.empty(n, dtype=object)
    acc = r  # 1 in Montgomery form
    wm = w % p
    for i in range(n):
        vals[i] = acc
        acc = acc * wm % p
    return ints_to_limbs([int(v) for v in vals])


class TiledDomain:
    """Single-chip 2^k NTT/INTT via the tiled four-step kernel.

    API-compatible with FastDomain: ntt/intt on (n, L) Montgomery arrays in
    natural order. k <= 20 (one VMEM-kernel per recursion level; larger
    sizes go through parallel/ntt_sharded.py across chips).
    """

    MIN_K = 15  # below this some level's lane batch < 128 (pad blowup)

    def __init__(self, k: int, interpret: bool = False):
        if not interpret and k < self.MIN_K:
            raise ValueError(
                f"TiledDomain needs k >= {self.MIN_K}; use FastDomain or "
                "EvaluationDomain for smaller sizes"
            )
        self.k = k
        self.n = 1 << k
        self.interpret = interpret
        self.domain = EvaluationDomain(k)
        p = F.modulus
        self._tables = {}
        for inverse in (False, True):
            w = self.domain.omega if not inverse else pow(self.domain.omega, p - 2, p)
            self._tables[inverse] = self._build_tables(w, inverse)
        self._perm = jnp.asarray(_stored_perm(k).astype(np.int32))
        self._fused: dict = {}  # SPT_NTT_FUSE=1 whole-chain jits, per direction
        # scale for intt: n^{-1} in Montgomery form
        n_inv = pow(self.n, p - 2, p)
        self._n_inv = jnp.asarray(ints_to_limbs([n_inv * (1 << 256) % p])[0])

    def _build_tables(self, w: int, inverse: bool):
        """Per-level (twpack, twmid) tables, leaves first.

        Level at size 2^kk splits as n1 = 2^(kk-KMAX) recursion cols x
        n2 = 2^KMAX kernel rows. twpack: packed per-stage kernel twiddles
        (L, m). twmid[n1_idx, r2] = w_level^(n1_idx * bitrev(r2)), stored
        limb-major (L, n1, n2).
        """
        p = F.modulus
        levels = []
        kk = self.k
        w_level = w
        while kk > KMAX:
            k1, k2 = kk - KMAX, KMAX
            n1, n2 = 1 << k1, 1 << k2
            # kernel twiddles for the length-n2 row NTTs: root w_level^n1
            levels.append(self._level_tables(pow(w_level, n1, p), k2, w_level, k1))
            kk = k1
            # the recursion's sub-NTT uses the n2-th power as its root
            w_level = pow(w_level, n2, p)
        # base kernel level: packed twiddles only
        levels.append((self._twpack(w_level, kk), None))
        return levels

    def _twpack(self, w: int, k: int) -> jnp.ndarray:
        """(k, L, 2^(k-1)) Pease constant-geometry stage twiddles.

        Stage s storage position p (< m/2) holds natural DIF index
        nu = ror_k(p, s); its twiddle is W^((nu mod 2^(k-s)) << s)."""
        m = 1 << k
        h = max(m // 2, 1)
        pows = _pow_table_mont(F, w, h)  # (m/2, L), exponents mod m/2 suffice
        pk = np.zeros((max(k, 1), N_LIMBS, h), dtype=np.uint32)
        p_idx = np.arange(h, dtype=np.int64)
        for s in range(k):
            nu = (p_idx >> s) | ((p_idx & ((1 << s) - 1)) << (k - s))
            exp = ((nu & ((1 << (k - s)) - 1)) << s) & (h - 1)
            pk[s] = pows[exp].T
        return jnp.asarray(pk)

    def _level_tables(self, w_row: int, k2: int, w_level: int, k1: int):
        p = F.modulus
        n1, n2 = 1 << k1, 1 << k2
        twpack = self._twpack(w_row, k2)
        # twmid[n1_idx, r2] = w_level^(n1_idx * bitrev(r2))
        pows = _pow_table_mont(F, w_level, n1 * n2)  # (n, L)
        r2k = _bitrev(k2)
        e = (np.arange(n1, dtype=np.int64)[:, None] * r2k[None, :]) % (n1 * n2)
        twmid = pows[e]  # (n1, n2, L)
        twmid = jnp.asarray(np.ascontiguousarray(twmid.transpose(2, 0, 1)))
        return twpack, twmid

    def _run(self, v, k: int, levels, li: int):
        """v: (L, B, 2^k) -> digit-reversed NTT along last axis."""
        twpack, twmid = levels[li]
        if k <= KMAX:
            return _bntt(v, twpack, k, self.interpret)
        L, B, _ = v.shape
        k1, k2 = k - KMAX, KMAX
        n1, n2 = 1 << k1, 1 << k2
        a = v.reshape(L, B, n2, n1).swapaxes(2, 3)  # (L, B, n1, n2)
        a = _bntt(a.reshape(L, B * n1, n2), twpack, k2, self.interpret)
        a = a.reshape(L, B, n1, n2)
        tw_flat = jnp.broadcast_to(
            twmid.reshape(L, 1, n1 * n2), (L, B, n1 * n2)
        ).reshape(L, B * n1 * n2)
        a = lm_mul(a.reshape(L, B * n1 * n2), tw_flat, self.interpret)
        a = a.reshape(L, B, n1, n2)
        a = a.swapaxes(2, 3)  # (L, B, r2, n1)
        a = self._run(a.reshape(L, B * n2, n1), k1, levels, li + 1)
        a = a.reshape(L, B, n2, n1).swapaxes(2, 3)
        return a.reshape(L, B, n1 * n2)

    def _transform(self, x, inverse: bool):
        # default: NOT one outer jit — the monolithic graph sent XLA
        # compile time to ~265 s, while the per-piece kernels compile in
        # seconds; dispatches pipeline asynchronously so eager glue between
        # jitted pieces costs no extra device time. SPT_NTT_FUSE=1 opts into
        # a single-dispatch jit of the whole chain (one-time compile cost is
        # amortized by the persistent compilation cache).
        if os.environ.get("SPT_NTT_FUSE") == "1":
            fused = self._fused.get(inverse)
            if fused is None:
                import functools as _ft

                def chain(v):
                    out = self._run(_to_lm(v), self.k, self._tables[inverse], 0)
                    scale = self._n_inv if inverse else None
                    return _finish(out, self._perm, scale, self.interpret)

                fused = jax.jit(chain)
                self._fused[inverse] = fused
            return fused(x)
        lm = _to_lm(x)  # (L, 1, n)
        out = self._run(lm, self.k, self._tables[inverse], 0)
        if inverse:
            return _finish(out, self._perm, self._n_inv, self.interpret)
        return _finish(out, self._perm, None, self.interpret)

    def ntt(self, x: jnp.ndarray) -> jnp.ndarray:
        """(n, L) Montgomery coefficients -> natural-order evaluations."""
        return self._transform(x, False)

    def intt(self, y: jnp.ndarray) -> jnp.ndarray:
        """(n, L) natural-order evaluations -> coefficients."""
        return self._transform(y, True)

    # --- batched entry points (C columns, one dispatch chain) -------------
    # The kernel geometry already carries a batch axis (the lane tile);
    # putting the column count there amortizes the per-pass dispatch
    # latency that dominates single-column wall-clock on the tunneled
    # backend (docs/PERF.md).

    def _transform_batch(self, x, inverse: bool):
        lm = _to_lm_batch(x)  # (L, C, n)
        out = self._run(lm, self.k, self._tables[inverse], 0)
        return _finish_batch(
            out, self._perm, self._n_inv if inverse else None, self.interpret
        )

    def ntt_batch(self, x: jnp.ndarray) -> jnp.ndarray:
        """(C, n, L) Montgomery coefficients -> natural-order evaluations."""
        return self._transform_batch(x, False)

    def intt_batch(self, y: jnp.ndarray) -> jnp.ndarray:
        """(C, n, L) natural-order evaluations -> coefficients."""
        return self._transform_batch(y, True)


@jax.jit
def _to_lm(x):
    return x.T[:, None, :]


@jax.jit
def _to_lm_batch(x):
    return x.transpose(2, 0, 1)


# row-count above which the n^{-1} scale must stay limb-major through
# lm_mul: the composed-op mont_mul on a (2^23, 16) row-major array compiles
# to a ~16 GB program (field_ops.BIG_MUL_ROWS note)
def _scale_big(N: int, interpret: bool) -> bool:
    from . import field_ops as fo

    return (
        not interpret and N >= fo.BIG_MUL_ROWS and jax.default_backend() != "cpu"
    )


@jax.jit
def _gather_batch(out, perm):
    return jnp.take(out, perm, axis=2)  # (L, C, n) stored -> natural


@jax.jit
def _gather_one(out, perm):
    return jnp.take(out[:, 0], perm, axis=1)  # (L, n)


def _finish_batch(out, perm, n_inv, interpret: bool = False):
    from . import field_ops as fo

    y_lm = _gather_batch(out, perm)  # (L, C, n)
    L, C, n = y_lm.shape
    if n_inv is not None and _scale_big(C * n, interpret):
        flat = lm_mul(
            y_lm.reshape(L, C * n),
            jnp.broadcast_to(n_inv[:, None], (L, C * n)),
        )
        return flat.reshape(L, C, n).transpose(1, 2, 0)
    y = y_lm.transpose(1, 2, 0)  # (C, n, L)
    if n_inv is not None:
        return fo.mont_mul(F, y, jnp.broadcast_to(n_inv, y.shape))
    return y


def _finish(out, perm, n_inv, interpret: bool = False):
    from . import field_ops as fo

    y_lm = _gather_one(out, perm)  # (L, n)
    if n_inv is not None and _scale_big(y_lm.shape[1], interpret):
        y_lm = lm_mul(y_lm, jnp.broadcast_to(n_inv[:, None], y_lm.shape))
        return y_lm.T
    y = y_lm.T  # (n, L)
    if n_inv is not None:
        return fo.mont_mul(F, y, jnp.broadcast_to(n_inv, y.shape))
    return y

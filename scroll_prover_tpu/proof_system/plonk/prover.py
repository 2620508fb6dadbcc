"""PLONKish prover (device NTT/MSM/scans + host orchestration).

Protocol (halo2-shaped; verifier.py mirrors it exactly):
  1. absorb vk digest + declared instance values; commit advice columns
  2. theta; per lookup commit permuted (A', S')
  3. beta, gamma; commit permutation grand-product chunks Z_a and lookup Zs
  4. commit random poly; y; build quotient h on the extended coset domain,
     commit chunks
  5. x; write evals of all queried polys at their rotations
  6. v; GWC multiopen: one witness W per distinct point; write Ws

Replaces halo2 create_proof as consumed by the reference
(SURVEY.md section 3.1: "halo2 create_proof @ degree 20 -> hot loops: MSM,
NTT/coset-FFT, quotient poly, permutation/lookup grand products"). All
per-row work (lookup compression, grand products, batched inversion) runs
on device as (n, 16)-limb vector ops — no Python inner loops over rows.
"""
from __future__ import annotations

import hashlib
import logging
import os
import time
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ...fields.bn254 import FR_MOD
from ...fields.limbs import FR_LIMB, ints_to_limbs, limbs_to_ints
from ...ops import field_ops as fo
from ...ops import poly as poly_ops
from ..kzg import SRS, kzg_commit, kzg_commit_batch
from ..transcript import PoseidonTranscript
from .cs import ConstraintSystem
from .keygen import DELTA, ProvingKey
from .mock import _pad_instance

F = FR_LIMB
log = logging.getLogger(__name__)


def _encode_mont(vals) -> jnp.ndarray:
    """Host ints OR packed (n, 8) u32 words -> (n, L) Montgomery limbs.

    The packed path uploads half the bytes and does the limb split on
    device (production columns live packed at rest); the bytes-based
    standard-form encode remains for plain int lists. Either way the
    Montgomery conversion is one device mont_mul."""
    if isinstance(vals, np.ndarray) and vals.dtype == np.uint32 and vals.ndim == 2:
        from ...fields.limbs import N_WORDS

        if vals.shape[1] == N_WORDS:
            return fo.to_mont(F, fo.unpack_limbs(jnp.asarray(vals)))
        return fo.to_mont(F, jnp.asarray(vals))
    arr = ints_to_limbs([int(v) % FR_MOD for v in vals])
    return fo.to_mont(F, jnp.asarray(arr))


# kept under the old name for callers (keygen-independent helpers)
_mont = _encode_mont


def _mont_scalar(v: int) -> jnp.ndarray:
    return jnp.asarray(ints_to_limbs([int(v) % FR_MOD * (1 << 256) % FR_MOD])[0])


def _bcast(s: jnp.ndarray, n: int) -> jnp.ndarray:
    return jnp.broadcast_to(s[None, :], (n, s.shape[-1]))


_PACK = os.environ.get("SPT_PACK_RESIDENT") == "1"

# Low-HBM choreography (round 4, VERDICT #1): at k=20 the real super
# circuit is ~200-600 columns; value tables + coefficient forms resident
# together blow the 16 GB chip. SPT_LOWMEM=1 keeps ONLY value tables
# resident through the grand-product phase — phase 1-3 commitments are
# computed straight from values over the LAGRANGE-basis SRS (identical
# points: same polynomial, different basis) — then converts values to
# coefficient form consume-as-you-go (each source column freed as its
# coeff form materializes) for the quotient/eval/opening phases. Proof
# bytes are bit-identical to the default path (asserted by
# tests/test_msm_v2.py::test_lowmem_proof_bytes_identical).
_LOWMEM = os.environ.get("SPT_LOWMEM") == "1"


def _P(x):
    """Pack a resident (n, 2L) limb column to (n, L) words (no-op unless
    SPT_PACK_RESIDENT=1; idempotent by shape). Halves HBM residency — the
    real super circuit holds ~200 columns x 64 MB at k=20."""
    from ...fields.limbs import N_LIMBS as _NL

    return fo.pack_limbs(x) if _PACK and x.shape[-1] == _NL else x


def _U(x):
    """Transiently unpack a packed column at its point of use."""
    from ...fields.limbs import N_LIMBS as _NL

    return fo.unpack_limbs(x) if x.shape[-1] == _NL // 2 else x


class _ValSource:
    """LRU-bounded device view over host packed value columns (lowmem).

    The round-5 production circuit is 281 advice + 153 fixed columns —
    ~14 GB of packed value tables at k=20, over the chip's effective
    budget. Columns materialize on demand from the host packed arrays
    (one h2d + unpack + to_mont each) and evict least-recently-used
    beyond `cap`; perm-queried columns can be PINNED for the
    grand-product phase. SPT_VALS_RESIDENT caps the pool (default
    unbounded = the old fully-resident behavior, which every test keeps)."""

    def __init__(self, cols_host):
        from collections import OrderedDict

        self.cols = cols_host
        self.cap = int(os.environ.get("SPT_VALS_RESIDENT", "0")) or (1 << 60)
        self.live = OrderedDict()
        self.pinned: dict = {}

    def __len__(self):
        return len(self.cols)

    def __getitem__(self, i):
        if i in self.pinned:
            return self.pinned[i]
        if i in self.live:
            self.live.move_to_end(i)
            return self.live[i]
        d = _P(_encode_mont(self.cols[i]))
        self.live[i] = d
        while len(self.live) > self.cap:
            self.live.popitem(last=False)
        return d

    def pin(self, i):
        if i not in self.pinned:
            d = self.live.pop(i, None)
            self.pinned[i] = d if d is not None else _P(_encode_mont(self.cols[i]))

    def take(self, i):
        """Load column i and DROP it from the pool (consume-as-you-go)."""
        d = self.pinned.pop(i, None)
        if d is None:
            d = self.live.pop(i, None)
        return d if d is not None else _P(_encode_mont(self.cols[i]))

    def clear(self):
        self.live.clear()
        self.pinned.clear()


class _LazyPoly:
    """Deferred coefficient column: materialized (packed) on demand and
    immediately droppable — phase 4-6 of a production k=20 prove would
    otherwise hold ~560 columns x 32 MB of coeff forms resident (sigma,
    lookup-permuted and fixed columns are cheap to rebuild: a device
    gather+mul, a host-cached packed value + one NTT)."""

    __slots__ = ("fn",)

    def __init__(self, fn):
        self.fn = fn

    def get(self):
        return self.fn()


def _R(pol):
    """Resolve a possibly-lazy poly handle to its (packed) device array."""
    return pol.get() if isinstance(pol, _LazyPoly) else pol


def _free(*arrs):
    """Reference-drop marker. MEASURED on the axon backend: plain
    refcount drops DO return HBM to the allocator, but Array.delete()
    LEAKS the buffer permanently (a 6 GB delete probe reclaimed zero
    bytes; the same drop via refcount reclaimed all of it plus
    headroom). So this intentionally does nothing beyond documenting the
    drop site — callers null their references right after."""
    return None


def _hbm_probe(tag: str) -> None:
    """SPT_MEM_PROBE=1: log the largest single allocation that currently
    succeeds (descending bisect, one buffer at a time, freed immediately)
    — the axon backend exposes no memory_stats. A greedy-to-exhaustion
    probe is NOT used: filling the arena mid-prove poisoned the very next
    upload (round-5 smoke3)."""
    if os.environ.get("SPT_MEM_PROBE") != "1":
        return
    got = 0.0
    for gb in (10.0, 8.0, 6.0, 4.0, 3.0, 2.0, 1.0, 0.5, 0.25):
        try:
            b = jnp.ones((int(gb * (1 << 28)),), jnp.uint32)
            np.asarray(b[0])
            del b
            got = gb
            break
        except Exception:
            continue
    log.info("hbm_probe[%s] largest-alloc ~%.2f GB", tag, got)


def _decode_mont(arr, count: int | None = None) -> list[int]:
    """(n, L) Montgomery device array -> host ints (standard form).

    Reads back PACKED words (two 16-bit limbs per u32): the packed bytes
    are exactly the little-endian 256-bit encoding, and the tunnel's ~7
    MB/s readback is the cost driver at production sizes — packing halves
    it (32 MB/column at k=20 instead of 64 MB)."""
    std = fo.from_mont(F, arr if count is None else arr[:count])
    packed = np.asarray(fo.pack_limbs(std), dtype=np.uint32)
    buf = packed.astype("<u4").tobytes()
    return [
        int.from_bytes(buf[i * 32 : (i + 1) * 32], "little")
        for i in range(packed.shape[0])
    ]


def _blind(seed: bytes, tag: str, count: int) -> list[int]:
    out = []
    for i in range(count):
        h = hashlib.sha256(seed + tag.encode() + i.to_bytes(4, "big")).digest()
        out.append(int.from_bytes(h, "little") % FR_MOD)
    return out


@dataclass
class _Queries:
    """Canonical query orders shared by prover and verifier."""

    advice: list[tuple[int, int]]
    fixed: list[tuple[int, int]]
    instance: list[tuple[int, int]]

    @classmethod
    def from_cs(cls, cs: ConstraintSystem) -> "_Queries":
        adv, fix, inst = set(), set(), set()
        exprs = [e for _, e in cs.gates]
        for lk in cs.lookups:
            exprs += lk.inputs + lk.tables
        for e in exprs:
            for kind, col, rot in e.queries():
                {"advice": adv, "fixed": fix, "instance": inst}[kind].add((col, rot))
        for c in cs.perm_columns:  # permutation argument queries rot 0
            {"advice": adv, "fixed": fix, "instance": inst}[c.kind].add((c.index, 0))
        return cls(sorted(adv), sorted(fix), sorted(inst))


def _parse_ntt_budget() -> int:
    """SPT_NTT_BATCH_BUDGET parsed once at import (ADVICE round-2: a
    malformed value must fail loudly at config time, not deep in prove())."""
    raw = os.environ.get("SPT_NTT_BATCH_BUDGET")
    if raw is None:
        # 2^22 elements = 256 MiB of u32x16 limbs per stacked group. The
        # tiled batch path holds ~8x the stacked size live inside one
        # program (transpose copies around the VMEM kernels): a 2^24 budget
        # compiled a 34 GB program at the 2^22 extended domain and OOMed
        # the 16 GB chip (round-3 prove20 run); 2^22 keeps the largest
        # program ~2-3 GB while still batching 4 columns at k=20.
        return 1 << 22
    try:
        return int(raw)
    except ValueError as e:
        raise ValueError(
            f"SPT_NTT_BATCH_BUDGET must be an integer (field-element budget "
            f"per batched NTT dispatch), got {raw!r}"
        ) from e


_NTT_BATCH_BUDGET = _parse_ntt_budget()

# extended-domain columns kept resident in streaming mode (reused by every
# permutation/lookup term; everything else is recomputed on demand)
_PINNED_EXT = frozenset({"l0", "l_last", "l_active"})


def _ntt_group(n: int) -> int:
    """Columns per batched NTT dispatch: cap the stacked working set at
    ~SPT_NTT_BATCH_BUDGET field elements (default 2^22 — see
    _parse_ntt_budget) so k=20+ domains don't blow HBM while small domains
    batch all ~50 prover columns into one traced graph (docs/PERF.md)."""
    return max(1, _NTT_BATCH_BUDGET // max(n, 1))


def _intt_cols(dom, cols) -> list:
    """Batched inverse-NTT over same-length columns (one dispatch chain per
    group instead of one per column — the tunnel round-trip dominated
    per-column wall-clock at production sizes)."""
    cols = list(cols)
    if len(cols) <= 1:
        return [_P(dom.intt(_U(c))) for c in cols]
    out: list = []
    g = _ntt_group(dom.n)
    for i in range(0, len(cols), g):
        grp = [_U(c) for c in cols[i : i + g]]
        if len(grp) == 1:
            out.append(_P(dom.intt(grp[0])))
        else:
            out.extend(_P(e) for e in dom.intt_batch(jnp.stack(grp)))
    return out


def _intt_host_cols(dom, cols_host) -> list:
    """Encode host value columns group-by-group and inverse-NTT them: only
    one NTT group of encoded values is ever device-resident on top of the
    accumulating coeff forms (lowmem sigma/fixed conversion)."""
    out: list = []
    g = _ntt_group(dom.n)
    for i in range(0, len(cols_host), g):
        grp = [_encode_mont([int(v) for v in c]) for c in cols_host[i : i + g]]
        if len(grp) == 1:
            out.append(_P(dom.intt(grp[0])))
        else:
            out.extend(_P(e) for e in dom.intt_batch(jnp.stack(grp)))
        del grp
    return out


def _advice_coeffs_lowmem(dom, src: "_ValSource", cs) -> list:
    """Advice value source -> coefficient columns with a residency budget.

    Columns are ranked by STATIC use count across gates/lookups/
    permutation (witness-independent, same ranking idea as the coset
    cache); the top SPT_ADVICE_COEFF_RESIDENT get materialized packed
    coeff forms (consume-as-you-go), the rest become _LazyPoly rebuilds
    over the host packed values. At 281 advice columns x 32 MB a full
    coeff pool is ~9 GB — the budget keeps phases 4-6 inside HBM."""
    cap = int(os.environ.get("SPT_ADVICE_COEFF_RESIDENT", "0")) or (1 << 60)
    n_cols = len(src)
    if cap >= n_cols:
        resident = set(range(n_cols))
    else:
        uses: dict[int, int] = {}
        for _, expr in cs.gates:
            for kind, c_, _rot in expr.queries():
                if kind == "advice":
                    uses[c_] = uses.get(c_, 0) + 1
        for lk in cs.lookups:
            for e in lk.inputs + lk.tables:
                for kind, c_, _rot in e.queries():
                    if kind == "advice":
                        uses[c_] = uses.get(c_, 0) + 1
        for cref in cs.perm_columns:
            if cref.kind == "advice":
                uses[cref.index] = uses.get(cref.index, 0) + 2
        order = sorted(range(n_cols), key=lambda i: -uses.get(i, 0))
        resident = set(order[:cap])
    out: list = [None] * n_cols
    g = _ntt_group(dom.n)
    batch: list[int] = []

    def flush():
        if not batch:
            return
        grp = [_U(src.take(j)) for j in batch]
        if len(grp) == 1:
            out[batch[0]] = _P(dom.intt(grp[0]))
        else:
            for j, e in zip(batch, dom.intt_batch(jnp.stack(grp))):
                out[j] = _P(e)
        np.asarray(out[batch[-1]][0, 0])  # drain so sources actually free
        batch.clear()

    for i in range(n_cols):
        if i in resident:
            batch.append(i)
            if len(batch) >= g:
                flush()
        else:
            src.live.pop(i, None)
            src.pinned.pop(i, None)
            out[i] = _LazyPoly(
                lambda i=i: dom.intt(_encode_mont(src.cols[i]))
            )
    flush()
    return out


def _intt_consume(dom, cols: list) -> list:
    """_intt_cols that FREES each source value column as its coefficient
    form materializes, so values and coeffs never fully coexist (lowmem:
    peak extra HBM is one NTT group, not a second copy of every column)."""
    out: list = []
    g = _ntt_group(dom.n)
    n_grp = (len(cols) + g - 1) // max(g, 1)
    for i in range(0, len(cols), g):
        if n_grp > 8:
            log.info("intt-consume %d/%d", i // g + 1, n_grp)
        grp = [_U(c) for c in cols[i : i + g]]
        if len(grp) == 1:
            out.append(_P(dom.intt(grp[0])))
        else:
            out.extend(_P(e) for e in dom.intt_batch(jnp.stack(grp)))
        for j in range(i, min(i + g, len(cols))):
            _free(cols[j])
            cols[j] = None
        del grp
        # drain the dispatch queue so retired source buffers actually free
        if out:
            np.asarray(out[-1][0, 0])
    return out


def _n_h(cs: ConstraintSystem, dom) -> int:
    """Quotient piece count: deg(h) < (d-1)n for term-degree budget d, so
    only d-1 of the extended_n/n natural pieces are ever nonzero — the rest
    would commit as identity points (unrepresentable in the in-circuit
    verifier, and wasted transcript/MSM work everywhere else)."""
    d = max(cs.max_gate_degree(), 5)
    return min(dom.extended_n // dom.n, max(1, d - 1))


def _perm_chunks(cs: ConstraintSystem) -> int:
    # chunk by the quotient-degree BUDGET (keygen._extended_j allows degree
    # 5 for the permutation/lookup arguments even when gates are lower
    # degree): fewer chunks = fewer grand products, commitments, and evals
    # — which directly shrinks the in-circuit verifier's MSM.
    return max(1, max(cs.max_gate_degree(), 5) - 2)


def absorb_instances(tr, vk, instance) -> None:
    """Shared prover/verifier transcript preamble: vk digest, then per
    instance column its declared length and values. Only DECLARED rows are
    absorbed (not the full domain) so an in-circuit verifier's transcript
    cost is O(proof size), not O(n) — the halo2/snark-verifier convention."""
    tr.common_scalar(vk.transcript_repr())
    for col in range(vk.cs.num_instance):
        src = instance[col] if instance and col < len(instance) else []
        tr.common_scalar(len(src))
        for v in src:
            tr.common_scalar(int(v) % FR_MOD)


def prove(
    srs: SRS,
    pk: ProvingKey,
    circuit,
    instance,
    transcript_cls=PoseidonTranscript,
    seed: bytes | None = None,
    multiopen: str = "gwc",
    ckpt=None,
    _debug: dict | None = None,
) -> bytes:
    # blinding entropy: fresh per proof by default (zero-knowledge); a fixed
    # seed is for deterministic tests only (round-1 ADVICE medium finding).
    # With a checkpoint the seed persists across process restarts so the
    # transcript replays bit-identically (checkpoint.py module docstring).
    if ckpt is not None:
        assert _LOWMEM, "checkpointed proves require SPT_LOWMEM=1"
        seed = ckpt.seed
    elif seed is None:
        import os as _os

        seed = _os.urandom(32)
    vk = pk.vk
    cs: ConstraintSystem = vk.cs
    dom = vk.domain
    n = dom.n
    usable = cs.usable_rows(n)
    u = usable - 1
    omega = dom.omega

    _t0 = time.perf_counter()

    def _mark(msg):
        log.info("prove[%s] %.1fs", msg, time.perf_counter() - _t0)
        _hbm_probe(msg)
    inst = _pad_instance(cs, n, instance)
    from .cs import assign_cached

    tables = assign_cached(circuit, cs, n, inst)
    advice_vals = []
    for i in range(cs.num_advice):
        col = tables["advice"][i]
        if isinstance(col, np.ndarray) and col.dtype == np.uint32:
            # packed (n, 8) from the assignment disk cache: blind in place
            col = np.array(col)  # materialize/copy (may be a read-only mmap)
            col[usable:] = _blind_packed(seed, f"adv{i}", n - usable)
        else:
            col = [int(v) % FR_MOD for v in col]
            col[usable:] = _blind(seed, f"adv{i}", n - usable)
        advice_vals.append(col)

    tr = transcript_cls()
    absorb_instances(tr, vk, instance)

    # --- device value tables (base domain, Montgomery form) ---------------
    # lowmem: LRU-bounded sources instead of fully-resident pools (the
    # production circuit's 281+153 columns are ~14 GB packed at k=20 —
    # over the chip; SPT_VALS_RESIDENT bounds what coexists)
    if _LOWMEM:
        advice_dev = _ValSource(advice_vals)
        fixed_dev = _ValSource(pk.fixed_values)
    else:
        advice_dev = [_P(_encode_mont(col)) for col in advice_vals]
        fixed_dev = _fixed_dev(pk, n)
    inst_dev = [_P(_encode_mont([int(v) for v in inst[i]])) for i in range(cs.num_instance)]
    if _PACK:
        # pack the keygen outputs resident for this prove (idempotent;
        # lowmem keygen defers fixed/sigma coeff forms to post-phase-3)
        if pk.fixed_polys is not None:
            pk.fixed_polys = [_P(x) for x in pk.fixed_polys]
        if pk.sigma_polys is not None:
            pk.sigma_polys = [_P(x) for x in pk.sigma_polys]
        pk.l0 = _P(pk.l0)
        pk.l_last = _P(pk.l_last)
    vals_dev = {"advice": advice_dev, "fixed": fixed_dev, "instance": inst_dev}
    ones_n = fo.one_mont(F, (n,))

    def eval_expr_dev(expr, theta: int):
        """Evaluate an expression over full columns on device -> (n, L)."""
        theta_b = _bcast(_mont_scalar(theta), n)

        def q(kind, col, rot):
            arr = _U(vals_dev[kind][col])
            return jnp.roll(arr, -rot, axis=0) if rot else arr

        return expr.evaluate(
            constant=lambda c: _bcast(_mont_scalar(c), n),
            query=q,
            challenge=lambda i: theta_b,
            add=lambda a, b: fo.add_mod(F, a, b),
            mul=lambda a, b: fo.mont_mul(F, a, b),
            neg=lambda a: fo.neg_mod(F, a),
        )

    def _commit_cols(polys, basis: str = "monomial"):
        """Commit packed columns in groups (default 8), unpacking
        transiently. SPT_COMMIT_BATCH bounds the group: the batched MSM's
        digit/sign/lane-table transients are ~350 MB per column at 2^20 —
        with ~11 GB of packed value tables resident, the k=20 production
        prove OOMs at 8 and fits at 2-4."""
        cb = int(os.environ.get("SPT_COMMIT_BATCH", "8"))
        out = []
        for i in range(0, len(polys), cb):
            out.extend(
                kzg_commit_batch(
                    srs, [_U(p) for p in polys[i : i + cb]], basis=basis
                )
            )
            if len(polys) > cb:
                # heartbeat: commit groups are the longest-running inner
                # units at production width (watchdog + observability)
                log.info("commit %d/%d", min(i + cb, len(polys)), len(polys))
        return out

    # --- phase 1: advice commitments -------------------------------------
    # lowmem: commit straight from VALUES over the Lagrange-basis SRS
    # (identical points — same polynomial, different basis); coefficient
    # forms are deferred until after phase 3 so values+coeffs never
    # coexist at full width
    if _LOWMEM:
        advice_polys = None

        def _p1():
            # stream columns through the LRU: each is loaded, committed
            # and evictable — full-width residency never happens
            cb = int(os.environ.get("SPT_COMMIT_BATCH", "8"))
            out = []
            for i in range(0, len(advice_dev), cb):
                grp = [
                    _U(advice_dev[j])
                    for j in range(i, min(i + cb, len(advice_dev)))
                ]
                out.extend(kzg_commit_batch(srs, grp, basis="lagrange"))
                if len(advice_dev) > cb:
                    log.info(
                        "commit %d/%d", min(i + cb, len(advice_dev)),
                        len(advice_dev),
                    )
            return out

        for c in (_p1() if ckpt is None else ckpt.points("p1_advice", _p1)):
            tr.write_point(c)
    else:
        advice_polys = _intt_cols(dom, advice_dev)
        _p1 = lambda: _commit_cols(advice_polys)
        for c in (_p1() if ckpt is None else ckpt.points("p1_advice", _p1)):
            tr.write_point(c)

    _mark("advice committed")
    theta = tr.squeeze_challenge()

    # --- phase 2: lookups -------------------------------------------------
    # compressed input/table columns: theta-Horner over expressions,
    # fully on device
    def compress_dev(exprs):
        acc = None
        theta_b = _bcast(_mont_scalar(theta), n)
        for e in exprs:
            v = eval_expr_dev(e, theta)
            acc = v if acc is None else fo.add_mod(
                F, fo.mont_mul(F, acc, theta_b), v
            )
        return acc

    _zpad = lambda m_: np.zeros((m_, 8), np.uint32)

    lookups = []
    for li, lk in enumerate(cs.lookups):

        def _build_lookup(lk=lk, li=li):
            """Compress, read back PACKED, permute (vectorized), blind."""
            a_dev = _P(compress_dev(lk.inputs))
            s_dev = _P(compress_dev(lk.tables))
            a_vals = np.concatenate(
                [_decode_mont_packed(_U(a_dev), usable), _zpad(n - usable)]
            )
            s_vals = np.concatenate(
                [_decode_mont_packed(_U(s_dev), usable), _zpad(n - usable)]
            )
            # grand product (hence multiset equality) covers rows 0..u-1
            a_perm, s_perm = _permute_lookup_packed(a_vals[:u], s_vals[:u])
            entry = {
                "a": a_vals,
                "s": s_vals,
                "a_perm": np.concatenate(
                    [a_perm, _blind_packed(seed, f"lkA{li}", n - u)]
                ),
                "s_perm": np.concatenate(
                    [s_perm, _blind_packed(seed, f"lkS{li}", n - u)]
                ),
            }
            if not _LOWMEM:
                # a/s compressed device columns stay resident for phase 3
                # (lowmem recomputes them from the value tables instead)
                entry["a_dev"], entry["s_dev"] = a_dev, s_dev
            return entry

        lookups.append(
            ckpt.lookup(li, _build_lookup) if ckpt is not None else _build_lookup()
        )
        if len(cs.lookups) > 4:
            log.info("lookup %d/%d", li + 1, len(cs.lookups))
    if _LOWMEM:
        # Lagrange-basis commits from values; coeff forms deferred to the
        # post-phase-3 conversion (same points, same transcript bytes).
        # ONE permuted column is device-resident at a time — encoded,
        # committed, dropped (the full set is ~2 GB at production width;
        # phase 3 re-encodes what it needs from the host lists)
        def _p2_commits():
            out = []
            for lk in lookups:
                for key_host in ("a_perm", "s_perm"):
                    d = _P(_encode_mont(lk[key_host]))
                    out.extend(_commit_cols([d], basis="lagrange"))
                    _free(d)
                    del d
            return out

        for c in (
            _p2_commits() if ckpt is None else ckpt.points("p2_perm", _p2_commits)
        ):
            tr.write_point(c)
    else:
        for lk in lookups:
            lk["a_perm_dev"] = _P(_encode_mont(lk["a_perm"]))
            lk["s_perm_dev"] = _P(_encode_mont(lk["s_perm"]))
        lk_polys = _intt_cols(
            dom,
            [d for lk in lookups for d in (lk["a_perm_dev"], lk["s_perm_dev"])],
        )
        for i, lk in enumerate(lookups):
            lk["a_poly"] = lk_polys[2 * i]
            lk["s_poly"] = lk_polys[2 * i + 1]
        for c in _commit_cols(lk_polys):
            tr.write_point(c)

    _mark("lookups committed")
    beta = tr.squeeze_challenge()
    gamma = tr.squeeze_challenge()
    if _LOWMEM:
        # the value tables served their last broad use (lookup
        # compression); PIN the permutation-queried columns for the
        # grand-product walk and release everything else — phase 3's
        # lookup numerators re-encode from the host a/s arrays, and the
        # coeff forms are lazy over the host packed values
        for cref in cs.perm_columns:
            if cref.kind in ("advice", "fixed"):
                vals_dev[cref.kind].pin(cref.index)
        advice_dev.live.clear()
        fixed_dev.live.clear()

    # --- phase 3: grand products (device scans + batched inversion) -------
    beta_b = _bcast(_mont_scalar(beta), n)
    gamma_b = _bcast(_mont_scalar(gamma), n)
    om_pows_dev = poly_ops.powers_mont(F, _mont_scalar(omega), n)
    row_idx = jnp.arange(n)

    def grand_product(num_dev, den_dev, z0_dev):
        """z[0] = z0; z[i+1] = z[i] * num[i]/den[i] for i < u; rows > u are
        z[u] (overwritten by blinding later). Returns (z_dev, z_u_dev)."""
        ratio = fo.mont_mul(F, num_dev, fo.batch_inv_mont(F, den_dev))
        ratio = fo.select(row_idx < u, ratio, ones_n)
        pp = poly_ops.prefix_prod_mont(F, ratio)
        shifted = jnp.concatenate([ones_n[:1], pp[:-1]])
        z = fo.mont_mul(F, _bcast(z0_dev, n), shifted)
        z_u = fo.mont_mul(F, z0_dev, pp[u - 1]) if u > 0 else z0_dev
        return z, z_u

    def with_blinding(z_dev, tag: str):
        bl = _encode_mont(_blind(seed, tag, n - u - 1))
        return z_dev.at[u + 1 :].set(bl)

    chunk_len = _perm_chunks(cs)
    m = len(cs.perm_columns)
    chunks = [
        list(range(a, min(a + chunk_len, m))) for a in range(0, m, chunk_len)
    ]
    if _LOWMEM:
        # stream each sigma column from its host values at point of use
        # (the full table is another #perm-columns x 32 MB resident pool
        # at k=20; the coeff forms are built consume-as-you-go later)
        sigma_at = lambda jj: pk.sigma_col_mont(jj)
    else:
        sigma_dev = _sigma_dev(pk, n)
        sigma_at = lambda jj: _U(sigma_dev[jj])

    perm_z_devs = []
    last_z = fo.one_mont(F)
    for chunk in chunks:
        num = ones_n
        den = ones_n
        for jj in chunk:
            cref = cs.perm_columns[jj]
            v = _U(vals_dev[cref.kind][cref.index])
            dj = _bcast(_mont_scalar(beta * pow(DELTA, jj, FR_MOD) % FR_MOD), n)
            num = fo.mont_mul(
                F, num,
                fo.add_mod(F, fo.add_mod(F, v, fo.mont_mul(F, dj, om_pows_dev)), gamma_b),
            )
            den = fo.mont_mul(
                F, den,
                fo.add_mod(
                    F,
                    fo.add_mod(F, v, fo.mont_mul(F, beta_b, sigma_at(jj))),
                    gamma_b,
                ),
            )
        z, last_z = grand_product(num, den, last_z)
        perm_z_devs.append(_P(with_blinding(z, f"permz{len(perm_z_devs)}")))
        # bound the async queue: each chunk's num/den graph holds ~10
        # column-sized intermediates until it retires
        np.asarray(perm_z_devs[-1][0, 0])

    lookup_z_devs = []
    one_sc = fo.one_mont(F)
    for li, lk in enumerate(lookups):
        if _LOWMEM:
            # re-encode the compressed a/s columns from the host value
            # lists captured in phase 2 (the fixed tables their
            # expressions reference were released after the commits)
            a_d = _encode_mont(lk["a"])
            s_d = _encode_mont(lk["s"])
        else:
            a_d, s_d = _U(lk["a_dev"]), _U(lk["s_dev"])
        num = fo.mont_mul(
            F,
            fo.add_mod(F, a_d, beta_b),
            fo.add_mod(F, s_d, gamma_b),
        )
        ap_d = (
            _U(lk["a_perm_dev"]) if "a_perm_dev" in lk
            else _encode_mont(lk["a_perm"])
        )
        sp_d = (
            _U(lk["s_perm_dev"]) if "s_perm_dev" in lk
            else _encode_mont(lk["s_perm"])
        )
        den = fo.mont_mul(
            F,
            fo.add_mod(F, ap_d, beta_b),
            fo.add_mod(F, sp_d, gamma_b),
        )
        del ap_d, sp_d
        z, _ = grand_product(num, den, one_sc)
        lookup_z_devs.append(_P(with_blinding(z, f"lkz{li}")))

    # ONE commit dispatch for perm Zs + lookup Zs + the random poly: no
    # challenge is squeezed between these transcript writes, so batching
    # them preserves the transcript byte stream while paying the
    # per-dispatch tunnel floor once instead of three times (VERDICT
    # round-3 weak #4: per-commit MSM floor).
    if _LOWMEM:
        rand_vals = _encode_mont(_blind(seed, "rand", n))
        _p3 = lambda: _commit_cols(
            perm_z_devs + lookup_z_devs + [rand_vals], basis="lagrange"
        )
    else:
        perm_z_polys = _intt_cols(dom, perm_z_devs)
        lookup_z_polys = _intt_cols(dom, lookup_z_devs)
        random_poly = dom.intt(_encode_mont(_blind(seed, "rand", n)))
        _p3 = lambda: _commit_cols(
            perm_z_polys + lookup_z_polys + [random_poly]
        )
    for c in (_p3() if ckpt is None else ckpt.points("p3", _p3)):
        tr.write_point(c)

    # --- phase 4: vanishing / quotient ------------------------------------
    _mark("grand products committed")
    y = tr.squeeze_challenge()

    instance_polys = _intt_cols(dom, inst_dev)
    _hbm_probe("p4:inst")
    if _LOWMEM:
        # value tables -> coefficient forms under a RESIDENCY BUDGET:
        # the top-used columns (same static ranking as the coset cache)
        # get materialized coeff forms; the rest stay LAZY over the host
        # packed values (blinding rows already applied), rebuilt per use
        # with one h2d + to_mont + iNTT. SPT_ADVICE_COEFF_RESIDENT caps
        # the resident set (default unbounded = old behavior).
        advice_polys = _advice_coeffs_lowmem(dom, advice_dev, cs)
        _hbm_probe("p4:advice-consumed")
        perm_z_polys = _intt_consume(dom, perm_z_devs)
        lookup_z_polys = _intt_consume(dom, lookup_z_devs)
        random_poly = dom.intt(rand_vals)
        rand_vals = None
        _hbm_probe("p4:z-consumed")
        for lk in lookups:
            lk.pop("a_perm_dev", None)
            lk.pop("s_perm_dev", None)
        # lookup-permuted coeff columns stay LAZY: rebuilt from the host
        # value lists on each use (one encode+NTT) instead of holding
        # 2 x #lookups x 32 MB across phases 4-6
        for lk in lookups:
            lk["a_poly"] = _LazyPoly(
                lambda lk=lk: dom.intt(_encode_mont(lk["a_perm"]))
            )
            lk["s_poly"] = _LazyPoly(
                lambda lk=lk: dom.intt(_encode_mont(lk["s_perm"]))
            )
    if pk.fixed_polys is None:
        # lowmem keygen committed fixed/sigma in the Lagrange basis; the
        # coeff forms stay LAZY here too — the packed standard-form value
        # bytes live in HOST RAM (one-time conversion of the device value
        # tables phases 1-3 used) and each use pays one h2d + to_mont +
        # NTT instead of 116 columns resident
        np_cache = []
        for col in pk.fixed_values:
            if isinstance(col, np.ndarray) and col.dtype == np.uint32:
                np_cache.append(np.asarray(col))  # already packed at rest
                continue
            arr = ints_to_limbs([int(v) % FR_MOD for v in col])  # (n, 16)
            np_cache.append(arr[:, 0::2] | (arr[:, 1::2] << np.uint32(16)))
        pk._fixed_np = np_cache
        pk._fixed_dev = None

        def _fixed_lazy(j):
            def build():
                v = fo.unpack_limbs(jnp.asarray(pk._fixed_np[j]))
                return dom.intt(fo.to_mont(F, v))

            return _LazyPoly(build)

        pk.fixed_polys = [_fixed_lazy(j) for j in range(len(pk.fixed_values))]
    if pk.sigma_polys is None:
        pk._sigma_dev = None
        # sigma coeffs LAZY: a device gather+mul + one NTT per use
        pk.sigma_polys = [
            _LazyPoly(lambda j=j: dom.intt(pk.sigma_col_mont(j)))
            for j in range(len(pk.sigma_values))
        ]
    # release base-domain value tables before the extended-domain walk: at
    # k=20 every retained (n, 16) array is 64 MB and the 2^22 quotient
    # phase runs within ~256 MB of the 16 GB HBM budget (round-3 OOM)
    for _pool in (advice_dev, fixed_dev):
        if isinstance(_pool, _ValSource):
            _pool.clear()
        elif _pool:
            _free(*_pool)
    for _pool in (inst_dev, perm_z_devs, lookup_z_devs):
        if _pool:
            _free(*_pool)
    vals_dev = advice_dev = inst_dev = fixed_dev = None
    perm_z_devs = lookup_z_devs = None
    for lk in lookups:
        for key in ("a_dev", "s_dev", "a_perm_dev", "s_perm_dev"):
            _free(lk.get(key))
            lk.pop(key, None)
    _hbm_probe("p4:pools-released")
    h_chunk_polys = _build_quotient(
        pk, dom, cs, advice_polys, [p for p in pk.fixed_polys],
        instance_polys,
        pk.sigma_polys, perm_z_polys, lookups, lookup_z_polys,
        chunks, theta, beta, gamma, y, u, ckpt=ckpt, _debug=_debug,
    )
    _mark("quotient built")
    # drain the dispatch queue BEFORE the commit MSMs enqueue: the pending
    # chain here includes the 2^(k+j) extended-domain iNTT whose program
    # transients must not coexist with the MSM bucket tables (round-5
    # smokes OOMed exactly at this boundary at k=17 with ~2 GB resident)
    for _h in h_chunk_polys:
        np.asarray(_h[0, 0])
    _hbm_probe("post-quotient")
    _p4 = lambda: _commit_cols(h_chunk_polys)
    for c in (_p4() if ckpt is None else ckpt.points("p4_h", _p4)):
        tr.write_point(c)
    _mark("quotient committed")

    x = tr.squeeze_challenge()

    # --- phase 5: evaluations --------------------------------------------
    # two-pass: enqueue every (poly, point) eval on device, then ONE stacked
    # readback + decode (per-eval readbacks cost a tunnel RTT each — ~30
    # evals made this phase 51 s at k=20, round-3 phase log). Transcript
    # write order is unchanged; no challenge is squeezed mid-phase.
    qs = _Queries.from_cs(cs)

    xw = x * omega % FR_MOD
    xwi = x * pow(omega, -1, FR_MOD) % FR_MOD
    xu = x * pow(omega, u, FR_MOD) % FR_MOD

    plan5: list[tuple] = []  # (poly, point, write_to_transcript)

    def emit(polyc, point, write=True):
        plan5.append((polyc, point, write))

    for col, rot in qs.advice:
        emit(advice_polys[col], _rot_point(x, omega, rot))
    for col, rot in qs.fixed:
        emit(pk.fixed_polys[col], _rot_point(x, omega, rot))
    for j in range(m):
        emit(pk.sigma_polys[j], x)
    for a, zp in enumerate(perm_z_polys):
        emit(zp, x)
        emit(zp, xw)
        if a < len(perm_z_polys) - 1:
            emit(zp, xu)
    for li, zp in enumerate(lookup_z_polys):
        emit(zp, x)
        emit(zp, xw)
        emit(lookups[li]["a_poly"], x)
        emit(lookups[li]["a_poly"], xwi)
        emit(lookups[li]["s_poly"], x)
    emit(random_poly, x)

    # h_combined: linear combo of chunks with x^{n a}; opened at x (value not
    # written — the verifier recomputes it from the constraint system)
    xn = pow(x, n, FR_MOD)
    h_comb = _U(h_chunk_polys[0])
    wpow = 1
    for a in range(1, len(h_chunk_polys)):
        wpow = wpow * xn % FR_MOD
        h_comb = poly_ops.axpy_mont(
            F, _mont_scalar(wpow), _U(h_chunk_polys[a]), h_comb
        )
    emit(h_comb, x, write=False)

    # one powers table per DISTINCT point (outer-product build), shared by
    # every opening at that point; per-eval = one mul + one tree-sum
    def _compute_evals():
        pw_tables: dict[int, jnp.ndarray] = {}
        for _, pt, _w in plan5:
            if pt not in pw_tables:
                pw_tables[pt] = _coset_x_outer(1, 1, n, dom.k, base=pt)
        ev_dev = [
            poly_ops.eval_poly_with_powers(F, _U(_R(p)), pw_tables[pt])
            for p, pt, _ in plan5
        ]
        return [int(v) for v in F.decode(np.asarray(jnp.stack(ev_dev)))]

    ev_vals = (
        _compute_evals() if ckpt is None else ckpt.scalars("p5_evals", _compute_evals)
    )
    queries: list[tuple] = []  # (poly, point, value)
    for (p, pt, write), v in zip(plan5, ev_vals):
        v = int(v)
        if write:
            tr.write_scalar(v)
        queries.append((p, pt, v))
    h_x = queries[-1][2]
    # instance polys are opened implicitly (verifier evaluates them itself)
    if _debug is not None:
        _debug.update(
            theta=theta, beta=beta, gamma=gamma, y=y, x=x, h_x=h_x,
            evals=[(pt, val) for _, pt, val in queries],
        )

    _mark("evals written")
    v_ch = tr.squeeze_challenge()

    if multiopen == "shplonk":
        # --- phase 6 (alt): SHPLONK/BDFG21 multiopen — 2 G1 points ------
        from .multiopen import query_labels, shplonk_open

        labels = query_labels(qs, m, len(chunks), len(lookups))
        queries = [
            (p if isinstance(p, _LazyPoly) else _U(p), pt, val)
            for (p, pt, val) in queries
        ]
        shplonk_open(
            srs, queries, labels, v_ch, tr, kzg_commit, _mont_scalar,
            _encode_mont,
        )
        _mark("multiopen done (shplonk)")
        return tr.finalize()

    # --- phase 6: GWC multiopen ------------------------------------------
    points_order: list[int] = []
    for _, point, _ in queries:
        if point not in points_order:
            points_order.append(point)

    def _p6_commits():
        wit_polys = []
        for point in points_order:
            group = [(p, val) for (p, pt, val) in queries if pt == point]
            comb = _combine(group, v_ch)
            wit_polys.append(
                poly_ops.kzg_quotient_mont(F, comb, _mont_scalar(point))
            )
        return kzg_commit_batch(srs, wit_polys)

    for c in (_p6_commits() if ckpt is None else ckpt.points("p6_w", _p6_commits)):
        tr.write_point(c)

    _mark("multiopen done")
    return tr.finalize()


# --- per-pk device caches (encode fixed/sigma value tables once) -------------


def _fixed_dev(pk: ProvingKey, n: int):
    cache = getattr(pk, "_fixed_dev", None)
    if cache is None:
        # _encode_mont takes packed cache columns and int lists alike
        cache = [_P(_encode_mont(col)) for col in pk.fixed_values]
        pk._fixed_dev = cache
    return cache


def _sigma_dev(pk: ProvingKey, n: int):
    cache = getattr(pk, "_sigma_dev", None)
    if cache is None:
        cache = [
            _P(pk.sigma_col_mont(j)) for j in range(len(pk.sigma_values))
        ]
        pk._sigma_dev = cache
    return cache


def _combine(group, v_ch):
    """sum_i v^i f_i over (poly, eval) pairs; f_0 gets v^0.

    Batched: stacked (B, n, L) mul by the v-power column + a halving
    tree-sum, instead of P sequential axpy dispatches (the GWC fold cost
    ~27 s at k=20 with ~25 polys per point, round-3 phase log). The stack
    is CHUNKED to bound the working set: a 450-query point at k=20 would
    otherwise stack 28 GB (the production super circuit hit this)."""
    # maxlen from the eager members only — resolving every lazy up front
    # would pin the full residency the lazies exist to avoid (~500 x 64 MB
    # at k=20). Lazy polys are always full-domain (dom.intt outputs), so a
    # lazy can never exceed an eager group-mate's length; the loop below
    # asserts that invariant at resolve time instead of silently
    # mis-padding (ADVICE round-4 low #3).
    eager_lens = [
        p.shape[0] for p, _ in group if not isinstance(p, _LazyPoly)
    ]  # shape[0] is basis-row count whether packed or not
    if eager_lens:
        maxlen = max(eager_lens)
    else:
        first = _R(group[0][0])
        group = [(first, group[0][1])] + list(group[1:])
        maxlen = first.shape[0]
    batch = max(1, _NTT_BATCH_BUDGET // max(maxlen, 1))
    vpows, vp = [], 1
    for _ in group:
        vpows.append(vp)
        vp = vp * v_ch % FR_MOD
    acc = None
    for b0 in range(0, len(group), batch):
        chunk = group[b0 : b0 + batch]
        padded = []
        for polyc, _ in chunk:
            polyc = _U(_R(polyc))
            assert polyc.shape[0] <= maxlen, (
                f"lazy poly of length {polyc.shape[0]} exceeds group maxlen "
                f"{maxlen} — _combine's eager-derived pad would corrupt it"
            )
            if polyc.shape[0] < maxlen:
                pad = jnp.zeros(
                    (maxlen - polyc.shape[0], polyc.shape[1]), jnp.uint32
                )
                polyc = jnp.concatenate([polyc, pad])
            padded.append(polyc)
        stacked = jnp.stack(padded)  # (B, n, L)
        vp_m = _encode_mont(vpows[b0 : b0 + batch])  # (B, L)
        # mont_mul_big: B*n rows easily exceeds the composed-CIOS limit
        weighted = fo.mont_mul_big(
            F, stacked, jnp.broadcast_to(vp_m[:, None, :], stacked.shape)
        )
        part = poly_ops.sum_mont(F, weighted)
        acc = part if acc is None else fo.add_mod(F, acc, part)
        del stacked, weighted, padded
    return acc


def _rot_point(x: int, omega: int, rot: int) -> int:
    if rot >= 0:
        return x * pow(omega, rot, FR_MOD) % FR_MOD
    return x * pow(pow(omega, -1, FR_MOD), -rot, FR_MOD) % FR_MOD


def _decode_mont_packed(arr, count: int | None = None) -> np.ndarray:
    """(n, L) Montgomery device array -> host (count, 8) packed u32 words in
    standard form. Same readback bytes as _decode_mont but no per-row
    int.from_bytes loop — production host columns stay packed."""
    std = fo.from_mont(F, arr if count is None else arr[:count])
    return np.asarray(fo.pack_limbs(std), dtype=np.uint32)


def _blind_packed(seed: bytes, tag: str, count: int) -> np.ndarray:
    from ...fields.limbs import ints_to_packed

    return ints_to_packed(_blind(seed, tag, count))


def _permute_lookup_packed(a: np.ndarray, s: np.ndarray):
    """Vectorized halo2 lookup permutation over packed (u, 8) u32 rows.

    Same semantics as _permute_lookup (A' value-sorted; each first
    occurrence of an A'-run aligned with one matching S' entry; leftovers
    fill the rest — leftover ORDER is free: rows where A'[i]==A'[i-1] only
    need the (A'-S')(A'-A'prev) factor, and S' multiset equality is what
    the grand product checks). The per-lookup Python sort + Counter walk
    was ~30 s at n=2^20; this is ~1 s of numpy.
    """
    u = a.shape[0]
    order_a = np.lexsort(tuple(a[:, w] for w in range(a.shape[1])))
    a_perm = a[order_a]
    first = np.empty(u, dtype=bool)
    first[0] = True
    np.any(a_perm[1:] != a_perm[:-1], axis=1, out=first[1:])
    distinct = a_perm[first]  # unique A values, sorted
    # merge distinct-A (flag 0) with S rows (flag 1), value-major sort with
    # the flag as the final minor key: each equal-value run lists its one
    # distinct-A row (if any) first, then the S copies
    comb = np.concatenate([distinct, s])
    flag = np.concatenate(
        [np.zeros(len(distinct), np.uint32), np.ones(s.shape[0], np.uint32)]
    )
    keys = (flag,) + tuple(comb[:, w] for w in range(comb.shape[1]))
    oc = np.lexsort(keys)
    cs_rows, cf = comb[oc], flag[oc]
    run_start = np.empty(len(cs_rows), dtype=bool)
    run_start[0] = True
    np.any(cs_rows[1:] != cs_rows[:-1], axis=1, out=run_start[1:])
    run_id = np.cumsum(run_start) - 1
    n_runs = run_id[-1] + 1 if len(run_id) else 0
    has_d = np.zeros(n_runs, bool)
    has_d[run_id[cf == 0]] = True
    s_count = np.bincount(run_id[cf == 1], minlength=n_runs)
    if (has_d & (s_count == 0)).any():
        bad = np.nonzero(has_d & (s_count == 0))[0][0]
        bad_val = cs_rows[np.searchsorted(run_id, bad)]
        from ...fields.limbs import packed_to_ints

        raise ValueError(
            f"lookup value {packed_to_ints(bad_val[None, :])[0]} not in table"
        )
    # leftovers: per run, s_count - has_d copies of the run value
    left_counts = s_count - has_d.astype(np.int64)
    run_vals = cs_rows[run_start]
    leftovers = np.repeat(run_vals, left_counts, axis=0)
    s_perm = np.empty_like(a_perm)
    s_perm[first] = distinct
    s_perm[~first] = leftovers[: u - len(distinct)]
    return a_perm, s_perm


def _permute_lookup(a_vals, s_vals):
    """halo2 lookup permutation: A' sorted; S' has each first-occurrence of
    an A'-run aligned, leftovers fill the rest."""
    usable = len(a_vals)
    a_perm = sorted(a_vals)
    from collections import Counter

    leftover = Counter(s_vals)
    s_perm = [None] * usable
    for i, v in enumerate(a_perm):
        if i == 0 or a_perm[i] != a_perm[i - 1]:
            if leftover[v] == 0:
                raise ValueError(f"lookup value {v} not in table")
            leftover[v] -= 1
            s_perm[i] = v
    rest = list(leftover.elements())
    ri = 0
    for i in range(usable):
        if s_perm[i] is None:
            s_perm[i] = rest[ri]
            ri += 1
    return a_perm, s_perm


def _quotient_walk(cs, chunks, theta, beta, gamma, u, env):
    """The constraint walk shared by both quotient drivers: emits every
    gate / permutation / lookup term through env.fold IN THE CANONICAL
    ORDER the verifier folds them (gates, permutation, lookups).

    env supplies the domain representation:
      q(kind, col, rot)   queried column values (rotation applied)
      zcol(tag)           permz/sigma/lkz/lka/lks column values
      l0, llast, lact     lagrange indicator values
      x_vals              X coordinate values on the (sub-)domain
      const(c), one       broadcast constants
      roll(arr, k)        values at omega^k * X
      fold(term)          y-fold accumulator
      mm/ad/sb/neg        field ops
    """
    mm, ad, sb, neg = env.mm, env.ad, env.sb, env.neg
    const, q, roll, fold = env.const, env.q, env.roll, env.fold

    for _, expr in cs.gates:
        fold(
            expr.evaluate(
                constant=const, query=q,
                challenge=lambda i: const(theta),
                add=ad, mul=mm, neg=neg,
            )
        )

    if env.n_perm_z:
        # fetch z columns lazily per use (a list comprehension would pin
        # every permutation z at once — ~2 GB of transients per coset for
        # the production super circuit's ~36 chunks)
        z_vals = lambda a: env.zcol(("permz", a))
        fold(mm(env.l0, sb(env.one, z_vals(0))))
        zl = z_vals(env.n_perm_z - 1)
        fold(mm(env.llast, sb(mm(zl, zl), zl)))
        del zl
        for a in range(1, len(chunks)):
            fold(mm(env.l0, sb(z_vals(a), roll(z_vals(a - 1), u))))
        beta_c = const(beta)
        gamma_c = const(gamma)
        for a, chunk in enumerate(chunks):
            za = z_vals(a)
            left = roll(za, 1)  # Z(omega X)
            right = za
            for jj in chunk:
                cref = cs.perm_columns[jj]
                v = q(cref.kind, cref.index, 0)
                sig = env.zcol(("sigma", jj))
                left = mm(left, ad(ad(v, mm(beta_c, sig)), gamma_c))
                idterm = mm(beta_c, mm(const(pow(DELTA, jj, FR_MOD)), env.x_vals))
                right = mm(right, ad(ad(v, idterm), gamma_c))
            fold(mm(env.lact, sb(left, right)))

    for li, lkexprs in enumerate(cs.lookups):
        z_v = env.zcol(("lkz", li))
        a_v = env.zcol(("lka", li))
        s_v = env.zcol(("lks", li))

        def compress(exprs):
            acc = None
            for e in exprs:
                v = e.evaluate(
                    constant=const, query=q,
                    challenge=lambda i: const(theta),
                    add=ad, mul=mm, neg=neg,
                )
                acc = v if acc is None else ad(mm(acc, const(theta)), v)
            return acc

        in_v = compress(lkexprs.inputs)
        tb_v = compress(lkexprs.tables)
        beta_c = const(beta)
        gamma_c = const(gamma)
        fold(mm(env.l0, sb(env.one, z_v)))
        fold(mm(env.llast, sb(mm(z_v, z_v), z_v)))
        lhs = mm(roll(z_v, 1), mm(ad(a_v, beta_c), ad(s_v, gamma_c)))
        rhs = mm(z_v, mm(ad(in_v, beta_c), ad(tb_v, gamma_c)))
        fold(mm(env.lact, sb(lhs, rhs)))
        a_prev = roll(a_v, -1)  # A'(omega^{-1} X)
        fold(mm(env.lact, mm(sb(a_v, s_v), sb(a_v, a_prev))))
        fold(mm(env.l0, sb(a_v, s_v)))


class _WalkEnv:
    def __init__(self, **kw):
        self.__dict__.update(kw)


def _build_quotient(
    pk, dom, cs, advice_polys, fixed_polys, instance_polys, sigma_polys,
    perm_z_polys, lookups, lookup_z_polys, chunks, theta, beta, gamma, y, u,
    ckpt=None, _debug: dict | None = None,
):
    """Evaluate all constraints on the extended coset domain, combine with y
    powers, divide by the vanishing poly, return h chunks (each (n, L)).

    Two drivers over the shared _quotient_walk:
      * full-domain (small k): every column extended to 2^(k+j) once, with
        batched prefetch — minimal dispatch count;
      * coset-streaming (huge k, TPU): the extended coset H_ext*g is the
        disjoint union of `ratio` size-n cosets shift_r*H with
        shift_r = g*w_ext^r; the walk runs once per sub-coset with ALL
        arrays at size n, so peak HBM is ~#columns * n * 64 B instead of
        ratio times that (at k=20/j=3 the full-domain driver needed ~16
        columns x 512 MB + transients and exhausted the 16 GB chip).
        Rotations by omega stay inside a sub-coset (omega = w_ext^ratio),
        so q/roll are plain in-coset rolls; the vanishing inverse is a
        per-coset CONSTANT. One final interleave + 2^(k+j) iNTT recovers
        h coefficients. This is also the natural multi-chip axis (cosets
        are embarrassingly parallel).
    """
    ext_n = dom.extended_n
    n = dom.n
    ratio = ext_n // n

    import jax as _jax

    stream = (
        (
            (ext_n >= (1 << 22) or _LOWMEM)
            and _jax.default_backend() != "cpu"
            or os.environ.get("SPT_FORCE_STREAM") == "1"
        )
        and _debug is None
    )
    # LOWMEM forces coset streaming at EVERY size on a real device: the
    # full-domain driver extends all ~400 queried columns to ext_n x 64 B
    # at once (~25 GB for the production circuit even at k=17's 2^20
    # extended domain — the round-5 smoke OOM), which contradicts the
    # low-HBM choreography by construction.
    lact_vals = [1] * u + [0] * (n - u)
    lact_poly = _P(dom.intt(_encode_mont(lact_vals)))
    by_kind = {"advice": advice_polys, "fixed": fixed_polys,
               "instance": instance_polys}
    zpolys = {}
    for jj in range(len(cs.perm_columns)):
        zpolys[("sigma", jj)] = sigma_polys[jj]
    for a, zp in enumerate(perm_z_polys):
        zpolys[("permz", a)] = zp
    for li, lk in enumerate(lookups):
        zpolys[("lkz", li)] = lookup_z_polys[li]
        zpolys[("lka", li)] = lk["a_poly"]
        zpolys[("lks", li)] = lk["s_poly"]

    mm = lambda a, b: fo.mont_mul_big(F, a, b)
    ad = lambda a, b: fo.add_mod(F, a, b)
    sb = lambda a, b: fo.sub_mod(F, a, b)
    neg = lambda a: fo.neg_mod(F, a)

    # vanishing values (zeta^n * w_ext^(i n) - 1) cycle with period ratio
    zn = pow(dom.g_coset, n, FR_MOD)
    wn = pow(dom.extended_omega, n, FR_MOD)
    vshort, a0 = [], zn
    for _ in range(ratio):
        vshort.append(pow((a0 - 1) % FR_MOD, -1, FR_MOD))
        a0 = a0 * wn % FR_MOD

    if stream:
        acc_ext = _quotient_cosets(
            pk, dom, cs, by_kind, zpolys, lact_poly, chunks,
            theta, beta, gamma, y, u, vshort, ckpt=ckpt,
        )
        _hbm_probe("p4:cosets-done")
    else:
        acc_ext = _quotient_full(
            pk, dom, cs, by_kind, zpolys, lact_poly, chunks,
            theta, beta, gamma, y, u, vshort, mm, ad, sb, neg, _debug,
        )

    np.asarray(acc_ext[0, 0])  # force the interleave before the big iNTT
    _hbm_probe("p4:interleaved")
    h_coeffs = dom.intt_extended(acc_ext)
    # split into chunks of n; pieces beyond the degree bound are identically
    # zero (see _n_h) and are not part of the proof
    out = []
    for a in range(_n_h(cs, dom)):
        out.append(h_coeffs[a * n : (a + 1) * n])
    return out


def _quotient_full(
    pk, dom, cs, by_kind, zpolys, lact_poly, chunks, theta, beta, gamma, y,
    u, vshort, mm, ad, sb, neg, _debug,
):
    ext_n = dom.extended_n
    n = dom.n
    ratio = ext_n // n
    cache: dict = {}

    def ext(polyc, tag):
        if tag in cache:
            return cache[tag]
        polyc = _U(_R(polyc))
        pad = jnp.zeros((ext_n - polyc.shape[0], polyc.shape[1]), jnp.uint32)
        e = dom.ntt_extended(jnp.concatenate([polyc, pad]))
        cache[tag] = e
        return e

    def prefetch_ext(pairs):
        """Run all pending extended NTTs as batched dispatches (grouped to a
        fixed HBM budget) instead of one chain per column."""
        pend = [(t, p) for t, p in pairs if t not in cache]
        g = _ntt_group(ext_n)
        for i in range(0, len(pend), g):
            grp = pend[i : i + g]
            if len(grp) == 1:
                ext(grp[0][1], grp[0][0])
                continue
            stacked = jnp.stack(
                [
                    jnp.concatenate(
                        [
                            _U(_R(p)),
                            jnp.zeros(
                                (ext_n - _U(_R(p)).shape[0],
                                 _U(_R(p)).shape[1]),
                                jnp.uint32,
                            ),
                        ]
                    )
                    for _, p in grp
                ]
            )
            for (t, _), r in zip(grp, dom.ntt_extended_batch(stacked)):
                cache[t] = r

    qs = _Queries.from_cs(cs)
    plan: list[tuple] = []
    for kind in ("advice", "fixed", "instance"):
        for col in sorted({c for c, _ in getattr(qs, kind)}):
            plan.append(((kind, col), by_kind[kind][col]))
    plan += [(tag, p) for tag, p in zpolys.items()]
    plan += [("l0", pk.l0), ("l_last", pk.l_last), ("l_active", lact_poly)]
    prefetch_ext(plan)

    def q(kind, col, rot):
        e = ext(by_kind[kind][col], (kind, col))
        return jnp.roll(e, -rot * ratio, axis=0)

    def const(c):
        return _bcast(_mont_scalar(c), ext_n)

    # X values on the extended coset: g * w_ext^i as a hi (x) lo outer
    # product (a length-ext_n prefix-product scan compiled past HBM at 2^23)
    x_e = _coset_x_outer(dom.g_coset, dom.extended_omega, ext_n, dom.extended_k)

    acc = jnp.zeros((ext_n, 16), jnp.uint32)
    y_c = const(y)
    terms_dbg = [] if _debug is not None else None

    def fold(t):
        nonlocal acc
        if terms_dbg is not None:
            terms_dbg.append(t)
        acc = ad(mm(acc, y_c), t)

    env = _WalkEnv(
        mm=mm, ad=ad, sb=sb, neg=neg, const=const, q=q, fold=fold,
        zcol=lambda tag: ext(zpolys[tag], tag),
        l0=ext(pk.l0, "l0"), llast=ext(pk.l_last, "l_last"),
        lact=ext(lact_poly, "l_active"),
        x_vals=x_e, one=fo.one_mont(F, (ext_n,)),
        roll=lambda arr, k: jnp.roll(arr, -k * ratio, axis=0),
        n_perm_z=len([1 for t in zpolys if t[0] == "permz"]),
    )
    _quotient_walk(cs, chunks, theta, beta, gamma, u, env)

    if _debug is not None:
        _debug["H_coeffs"] = dom.intt_extended(acc)
        _debug["terms_ext"] = [dom.intt_extended(t) for t in terms_dbg]

    vinv = vshort * (ext_n // ratio)
    return mm(acc, _encode_mont(vinv))


def _quotient_cosets(
    pk, dom, cs, by_kind, zpolys, lact_poly, chunks, theta, beta, gamma, y,
    u, vshort, ckpt=None,
):
    ext_n = dom.extended_n
    n = dom.n
    ratio = ext_n // n
    mm = lambda a, b: fo.mont_mul_big(F, a, b)
    ad = lambda a, b: fo.add_mod(F, a, b)
    sb = lambda a, b: fo.sub_mod(F, a, b)
    neg = lambda a: fo.neg_mod(F, a)
    P = FR_MOD
    om_pows = None  # powers of omega over H, shared by every coset
    # every column the walk will touch, known statically from the cs: the
    # per-coset scale-mul + size-n NTT of ALL of them runs as BATCHED
    # dispatches (ntt_batch groups under _ntt_group) — one chain per group
    # instead of one lazy chain per column (the tunnel dispatch latency
    # dominated the per-column path; docs/PERF.md round 3)
    qs = _Queries.from_cs(cs)
    plan: list[tuple] = []
    for kind in ("advice", "fixed", "instance"):
        for c_ in sorted({c for c, _ in getattr(qs, kind)}):
            plan.append(((kind, c_), by_kind[kind][c_]))
    plan += [(tag, p) for tag, p in zpolys.items()]
    plan += [("l0", pk.l0), ("l_last", pk.l_last), ("l_active", lact_poly)]
    # SPT_COSET_CACHE_COLS caps the per-coset cache (at k=20 a 500-column
    # circuit's full cache is ~16 GB — over the chip). Columns beyond the
    # cap are re-NTT'd at every use; the plan is ordered by STATIC use
    # count (walk structure is witness-independent) so the hottest columns
    # — selectors, shared tables — stay cached.
    cache_cap = int(os.environ.get("SPT_COSET_CACHE_COLS", "0")) or None
    if cache_cap is not None:
        uses: dict = {}

        def _count(tag):
            uses[tag] = uses.get(tag, 0) + 1

        for _, expr in cs.gates:
            for kind, c_, _rot in expr.queries():
                _count((kind, c_))
        for jj, cref in enumerate(cs.perm_columns):
            _count((cref.kind, cref.index))
            _count(("sigma", jj))
        for a in range(len([t for t in zpolys if t[0] == "permz"])):
            uses[("permz", a)] = uses.get(("permz", a), 0) + 3
        for li, lkexprs in enumerate(cs.lookups):
            for e in lkexprs.inputs + lkexprs.tables:
                for kind, c_, _rot in e.queries():
                    _count((kind, c_))
            uses[("lkz", li)] = 3
            uses[("lka", li)] = 4
            uses[("lks", li)] = 2
        for t in ("l0", "l_last", "l_active"):
            uses[t] = 1 << 30  # pinned: used by nearly every non-gate term
        plan.sort(key=lambda e: -uses.get(e[0], 0))
    accs = []
    for r in range(ratio):
        if ckpt is not None and ckpt.has_coset(r):
            # checkpointed sub-coset accumulator: packed Montgomery words
            packed = ckpt.coset(r, None)
            accs.append(fo.unpack_limbs(jnp.asarray(packed)))
            log.info("quotient coset %d/%d (checkpoint)", r + 1, ratio)
            continue
        shift = dom.g_coset * pow(dom.extended_omega, r, P) % P
        # coeff scale table shift^j: hi (x) lo outer product on device
        scale = _coset_x_outer(1, 1, n, dom.k, base=shift)
        if om_pows is None:
            om_pows = _coset_x_outer(1, 1, n, dom.k, base=dom.omega)
        cache: dict = {}

        g = _ntt_group(n)
        prefill = plan if cache_cap is None else plan[:cache_cap]
        for i in range(0, len(prefill), g):
            grp = prefill[i : i + g]
            if len(grp) == 1:
                t_, p_ = grp[0]
                cache[t_] = _P(dom.ntt(fo.mont_mul_big(F, _U(_R(p_)), scale)))
            else:
                stacked = jnp.stack([_U(_R(p_)) for _, p_ in grp])
                scaled = fo.mont_mul_big(
                    F, stacked, jnp.broadcast_to(scale, stacked.shape)
                )
                for (t_, _), e_ in zip(grp, dom.ntt_batch(scaled)):
                    cache[t_] = _P(e_)

        def col(polyc, tag):
            if tag in cache:
                return _U(cache[tag])
            e = dom.ntt(fo.mont_mul_big(F, _U(_R(polyc)), scale))
            if cache_cap is None or len(cache) < cache_cap:
                cache[tag] = _P(e)
            return e

        def q(kind, c_, rot):
            e = col(by_kind[kind][c_], (kind, c_))
            return jnp.roll(e, -rot, axis=0) if rot else e

        def const(c):
            return _bcast(_mont_scalar(c), n)

        acc = jnp.zeros((n, 16), jnp.uint32)
        y_c = const(y)

        n_folds = 0

        def fold(t):
            nonlocal acc, n_folds
            acc = ad(mm(acc, y_c), t)
            n_folds += 1
            # bound the async dispatch queue every few terms: each in-flight
            # term holds ~0.6 GB of enqueued outputs at 2^20; a 1-element
            # readback drains the queue (block_until_ready is a no-op on the
            # tunneled backend), but each costs a tunnel RTT — syncing every
            # fold made the sync cost rival the math (round-3 phase log)
            if n_folds % 4 == 0:
                np.asarray(acc[0, 0])

        env = _WalkEnv(
            mm=mm, ad=ad, sb=sb, neg=neg, const=const, q=q, fold=fold,
            zcol=lambda tag: col(zpolys[tag], tag),
            l0=col(pk.l0, "l0"), llast=col(pk.l_last, "l_last"),
            lact=col(lact_poly, "l_active"),
            x_vals=fo.mont_mul_big(
                F, om_pows, _bcast(_mont_scalar(shift), n)
            ),
            one=fo.one_mont(F, (n,)),
            roll=lambda arr, k: jnp.roll(arr, -k, axis=0),
            n_perm_z=len([1 for t in zpolys if t[0] == "permz"]),
        )
        _quotient_walk(cs, chunks, theta, beta, gamma, u, env)
        # vanishing inverse is constant on this coset
        acc = mm(acc, _bcast(_mont_scalar(vshort[r]), n))
        cache.clear()
        if ckpt is not None:
            # persist the finished sub-coset (packed Montgomery readback,
            # 32 MB at k=20): a tunnel drop or OOM mid-quotient resumes at
            # the first unfinished coset instead of re-walking all of them
            ckpt.coset(r, lambda: np.asarray(fo.pack_limbs(acc), np.uint32))
            log.info("quotient coset %d/%d done (checkpointed)", r + 1, ratio)
        else:
            log.info("quotient coset %d/%d done", r + 1, ratio)
        accs.append(acc)
    # interleave: ext position i*ratio + r <-> shift_r * omega^i
    return jnp.stack(accs, axis=1).reshape(ext_n, 16)


def _coset_x_outer(g: int, w: int, count: int, k: int, base: int | None = None):
    """(count, 16) Montgomery table t[i] = g * w^i (or base^i when base is
    given), built as a hi (x) lo outer product: two host-built factor tables
    of ~sqrt(count) entries and ONE tiled device mul — a length-count
    prefix-product scan at 2^23 compiled past HBM (round 3)."""
    P = FR_MOD
    if base is not None:
        g, w = 1, base
    nl = 1 << (k // 2)
    nh = count // nl
    lo_ints, acc = [], g % P
    for _ in range(nl):
        lo_ints.append(acc)
        acc = acc * w % P
    w_nl = pow(w, nl, P)
    hi_ints, acc = [], 1
    for _ in range(nh):
        hi_ints.append(acc)
        acc = acc * w_nl % P
    lo_m = _encode_mont(lo_ints)
    hi_m = _encode_mont(hi_ints)
    return fo.mont_mul_big(
        F,
        jnp.broadcast_to(hi_m[:, None, :], (nh, nl, 16)),
        jnp.broadcast_to(lo_m[None, :, :], (nh, nl, 16)),
    ).reshape(count, 16)

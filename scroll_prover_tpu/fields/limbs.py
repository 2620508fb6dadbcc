"""Limb-plane representation of 256-bit field elements for TPU.

TPUs have no 64-bit scalar/vector integer units, so field elements are stored
as 16 little-endian limbs of 16 bits, each held in a uint32 lane. A 16x16-bit
product fits a uint32 exactly ((2^16-1)^2 < 2^32), which is what makes CIOS
Montgomery multiplication (ops/field_ops.py) exact in 32-bit arithmetic.

An array of n field elements is a uint32 array of shape (..., n, N_LIMBS)
("limb-last"): elementwise field ops vectorize over the leading axes and the
16-wide limb axis rides in the minor-most vector lanes.

This replaces the reference's 4x64-bit Montgomery representation in the
halo2curves fork (SURVEY.md section 2.2, Cargo.lock:1911-1913) with a layout
chosen for the TPU VPU rather than x86-64.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Sequence

import numpy as np

from .bn254 import FQ_MOD, FR_MOD

LIMB_BITS = 16
N_LIMBS = 16  # 256 bits
LIMB_MASK = (1 << LIMB_BITS) - 1
TOTAL_BITS = LIMB_BITS * N_LIMBS  # 256
R_POW = 1 << TOTAL_BITS  # Montgomery radix R = 2^256


def int_to_limbs(x: int) -> np.ndarray:
    """A single int (< 2^256) -> (N_LIMBS,) uint32 little-endian limbs."""
    return np.frombuffer(int(x).to_bytes(32, "little"), dtype="<u2").astype(np.uint32)


def limbs_to_int(limbs) -> int:
    """(N_LIMBS,) limbs -> int."""
    arr = np.asarray(limbs, dtype=np.uint32).astype("<u2")
    return int.from_bytes(arr.tobytes(), "little")


def ints_to_limbs(xs: Sequence[int]) -> np.ndarray:
    """Vector of ints -> (n, N_LIMBS) uint32."""
    buf = b"".join(int(x).to_bytes(32, "little") for x in xs)
    return (
        np.frombuffer(buf, dtype="<u2").reshape(len(xs), N_LIMBS).astype(np.uint32)
    )


def limbs_to_ints(arr) -> list[int]:
    """(n, N_LIMBS) uint32 -> list of ints."""
    a = np.asarray(arr, dtype=np.uint32).astype("<u2")
    n = a.shape[0]
    buf = a.tobytes()
    return [int.from_bytes(buf[i * 32 : (i + 1) * 32], "little") for i in range(n)]


# -- packed host representation ----------------------------------------------
# (n, 8) uint32 words, two 16-bit limbs per word, value little-endian across
# words. This is the at-rest form for production-size columns (half the RAM/
# disk/tunnel bytes of the limb form) and matches ops/field_ops.pack_limbs:
# word j = limb[2j] | limb[2j+1] << 16. The raw little-endian byte stream of
# a packed row IS the canonical 32-byte little-endian field encoding.

N_WORDS = N_LIMBS // 2


def pack_host(arr16: np.ndarray) -> np.ndarray:
    """(n, N_LIMBS) u32 limbs -> (n, N_WORDS) u32 packed words (host)."""
    a = np.asarray(arr16, dtype=np.uint32)
    return a[..., 0::2] | (a[..., 1::2] << np.uint32(16))


def unpack_host(packed: np.ndarray) -> np.ndarray:
    """(n, N_WORDS) u32 packed -> (n, N_LIMBS) u32 limbs (host)."""
    p = np.asarray(packed, dtype=np.uint32)
    out = np.empty(p.shape[:-1] + (N_LIMBS,), np.uint32)
    out[..., 0::2] = p & np.uint32(0xFFFF)
    out[..., 1::2] = p >> np.uint32(16)
    return out


def ints_to_packed(xs: Sequence[int]) -> np.ndarray:
    """Vector of ints -> (n, N_WORDS) packed words."""
    buf = b"".join(int(x).to_bytes(32, "little") for x in xs)
    return np.frombuffer(buf, dtype="<u4").reshape(len(xs), N_WORDS).astype(np.uint32)


def packed_to_ints(packed: np.ndarray) -> list[int]:
    """(n, N_WORDS) packed -> list of ints."""
    p = np.ascontiguousarray(np.asarray(packed, dtype=np.uint32)).astype("<u4")
    buf = p.tobytes()
    return [
        int.from_bytes(buf[i * 32 : (i + 1) * 32], "little")
        for i in range(p.shape[0])
    ]


def objcol_to_packed(col) -> np.ndarray:
    """Assignment column (object array / list of ints) -> packed words.

    Fast path: columns whose values all fit int64 (selectors, bytes, small
    counters — the majority of zkevm assignment columns) convert through
    one vectorized astype instead of a per-element to_bytes loop."""
    arr = np.asarray(col, dtype=object)
    try:
        small = arr.astype(np.int64)
    except (OverflowError, TypeError):
        # canonical reduction mirrors the prover's int(v) % FR_MOD encode
        return ints_to_packed([int(v) % FR_MOD for v in col])
    if (small < 0).any():
        return ints_to_packed([int(v) % FR_MOD for v in col])
    out = np.zeros((len(col), N_WORDS), np.uint32)
    u = small.astype(np.uint64)
    out[:, 0] = (u & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    out[:, 1] = (u >> np.uint64(32)).astype(np.uint32)
    return out


@dataclass(frozen=True, eq=False)  # identity hash: usable as a jit static arg
class LimbField:
    """Per-field Montgomery constants in limb form, consumed by ops/field_ops."""

    modulus: int
    name: str
    # derived (filled by __post_init__)
    p_limbs: np.ndarray = field(init=False, repr=False)
    n0inv: int = field(init=False)  # (-p)^-1 mod 2^LIMB_BITS
    r_mod_p: int = field(init=False)  # R mod p == Montgomery form of 1
    r2_mod_p: int = field(init=False)  # R^2 mod p (to_mont multiplier)
    r_limbs: np.ndarray = field(init=False, repr=False)
    r2_limbs: np.ndarray = field(init=False, repr=False)
    zero_limbs: np.ndarray = field(init=False, repr=False)

    def __post_init__(self):
        p = self.modulus
        object.__setattr__(self, "p_limbs", int_to_limbs(p))
        object.__setattr__(
            self, "n0inv", (-pow(p, -1, 1 << LIMB_BITS)) % (1 << LIMB_BITS)
        )
        object.__setattr__(self, "r_mod_p", R_POW % p)
        object.__setattr__(self, "r2_mod_p", (R_POW * R_POW) % p)
        object.__setattr__(self, "r_limbs", int_to_limbs(R_POW % p))
        object.__setattr__(self, "r2_limbs", int_to_limbs((R_POW * R_POW) % p))
        object.__setattr__(self, "zero_limbs", np.zeros(N_LIMBS, np.uint32))

    # host-side Montgomery codec (tests + host/device marshalling)
    def to_mont_int(self, x: int) -> int:
        return (x * R_POW) % self.modulus

    def from_mont_int(self, x: int) -> int:
        return (x * pow(R_POW, -1, self.modulus)) % self.modulus

    def encode(self, xs: Sequence[int], mont: bool = True) -> np.ndarray:
        """ints -> (n, N_LIMBS) limbs, optionally in Montgomery form."""
        if mont:
            xs = [(int(x) % self.modulus) * R_POW % self.modulus for x in xs]
        else:
            xs = [int(x) % self.modulus for x in xs]
        return ints_to_limbs(xs)

    def decode(self, arr, mont: bool = True) -> list[int]:
        """(n, N_LIMBS) limbs -> ints, undoing Montgomery form."""
        vals = limbs_to_ints(arr)
        if mont:
            rinv = pow(R_POW, -1, self.modulus)
            vals = [v * rinv % self.modulus for v in vals]
        return vals


FQ_LIMB = LimbField(FQ_MOD, "bn254_fq")
FR_LIMB = LimbField(FR_MOD, "bn254_fr")

"""Host-side BN254 group arithmetic (affine, plain ints).

Ground truth for the device EC kernels (ops/ec.py, ops/msm.py) and the
verifier's pairing-side point handling. Mirrors the consumed surface of
halo2curves bn256 (reference: integration/src/prove.rs:1; SURVEY.md L0).

G1: y^2 = x^3 + 3 over Fq.           Points: (x, y) tuples or None = infinity.
G2: y^2 = x^3 + 3/(9+u) over Fq2.    Fq2 elements: (c0, c1) = c0 + c1*u.
"""
from __future__ import annotations

from ..fields.bn254 import FQ_MOD, FR_MOD, G2_GEN_X, G2_GEN_Y

P = FQ_MOD
R = FR_MOD

# b' = 3 / (9 + u) in Fq2 for the G2 twist curve
def _fq2_inv(a):
    c0, c1 = a
    t = pow((c0 * c0 + c1 * c1) % P, P - 2, P)
    return (c0 * t % P, (-c1 * t) % P)


def _fq2_mul(a, b):
    a0, a1 = a
    b0, b1 = b
    return ((a0 * b0 - a1 * b1) % P, (a0 * b1 + a1 * b0) % P)


def _fq2_scalar(a, k):
    return (a[0] * k % P, a[1] * k % P)


TWIST_B = _fq2_scalar(_fq2_inv((9, 1)), 3)  # 3/(9+u)


class _Group:
    """Generic short-Weierstrass affine group over a field interface."""

    def __init__(self, add, sub, mul, inv, b, zero, name):
        self.fadd, self.fsub, self.fmul, self.finv = add, sub, mul, inv
        self.b = b
        self.fzero = zero
        self.name = name

    def is_on_curve(self, pt) -> bool:
        if pt is None:
            return True
        x, y = pt
        lhs = self.fmul(y, y)
        rhs = self.fadd(self.fmul(self.fmul(x, x), x), self.b)
        return lhs == rhs

    def neg(self, pt):
        if pt is None:
            return None
        x, y = pt
        return (x, self.fsub(self.fzero, y))

    def double(self, pt):
        if pt is None:
            return None
        x, y = pt
        if y == self.fzero:
            return None
        # l = 3x^2 / 2y
        num = self.fmul(self.fmul(x, x), self._three)
        den = self.finv(self.fadd(y, y))
        l = self.fmul(num, den)
        x3 = self.fsub(self.fmul(l, l), self.fadd(x, x))
        y3 = self.fsub(self.fmul(l, self.fsub(x, x3)), y)
        return (x3, y3)

    def add(self, p1, p2):
        if p1 is None:
            return p2
        if p2 is None:
            return p1
        x1, y1 = p1
        x2, y2 = p2
        if x1 == x2:
            if y1 == y2:
                return self.double(p1)
            return None
        l = self.fmul(self.fsub(y2, y1), self.finv(self.fsub(x2, x1)))
        x3 = self.fsub(self.fsub(self.fmul(l, l), x1), x2)
        y3 = self.fsub(self.fmul(l, self.fsub(x1, x3)), y1)
        return (x3, y3)

    def mul(self, pt, k: int):
        k %= R
        acc = None
        while k:
            if k & 1:
                acc = self.add(acc, pt)
            pt = self.double(pt)
            k >>= 1
        return acc


def _mk_g1():
    g = _Group(
        add=lambda a, b: (a + b) % P,
        sub=lambda a, b: (a - b) % P,
        mul=lambda a, b: a * b % P,
        inv=lambda a: pow(a, P - 2, P),
        b=3,
        zero=0,
        name="G1",
    )
    g._three = 3
    return g


def _mk_g2():
    g = _Group(
        add=lambda a, b: ((a[0] + b[0]) % P, (a[1] + b[1]) % P),
        sub=lambda a, b: ((a[0] - b[0]) % P, (a[1] - b[1]) % P),
        mul=_fq2_mul,
        inv=_fq2_inv,
        b=TWIST_B,
        zero=(0, 0),
        name="G2",
    )
    g._three = (3, 0)
    return g


G1 = _mk_g1()
G2 = _mk_g2()


def g1_generator():
    return (1, 2)


def g2_generator():
    return (G2_GEN_X, G2_GEN_Y)


def msm_naive(points, scalars):
    """Host reference MSM: sum scalars[i] * points[i] over G1."""
    acc = None
    for pt, s in zip(points, scalars):
        acc = G1.add(acc, G1.mul(pt, s))
    return acc

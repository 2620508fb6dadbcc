"""PLONKish proving backend (halo2-shaped, TPU-first).

The constraint-system model mirrors what the reference stack's halo2 fork
provides (SURVEY.md L1: "PLONKish constraint system ... permutation & lookup
arguments, MockProver, keygen/create_proof"): fixed/advice/instance columns,
polynomial gates with rotations, copy constraints via a permutation argument,
Aztec-style permuted lookups, vanishing/quotient argument, KZG multiopen.

Split:
  expression.py  — gate expression AST -> jitted device evaluators
  cs.py          — ConstraintSystem + circuit/assignment model
  mock.py        — MockProver equivalent (constraint checker, no proving)
  keygen.py      — vk/pk: fixed/sigma polys + commitments
  prover.py      — the real prover (device NTT/MSM/scans)
  verifier.py    — host verifier (pairing check)
"""
from .expression import (  # noqa: F401
    Advice, Challenge, Constant, Expression, Fixed, Instance,
)
from .cs import Circuit, ConstraintSystem  # noqa: F401
from .mock import MockProver  # noqa: F401

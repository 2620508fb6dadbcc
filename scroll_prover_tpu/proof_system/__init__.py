"""Proof-system layer: transcripts, KZG commitment scheme, PLONKish backend.

Replaces the reference's halo2_proofs fork (SURVEY.md L1): KZG commit/open
(GWC + SHPLONK), transcripts, constraint system, keygen, prover, verifier.
Heavy math (MSM, NTT, poly algebra) runs on device via ops/; this package is
the orchestration and host-verify side.
"""
from .transcript import PoseidonTranscript, KeccakTranscript, Blake2bTranscript  # noqa: F401
from .kzg import SRS, kzg_commit, kzg_open, verify_single_open  # noqa: F401

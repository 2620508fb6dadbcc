"""Prover facade: the public API mirroring the reference `prover` crate.

Surface parity (SURVEY.md section 2.3, compiled from every `prover::`
reference in the reference repo): ChunkProver/ChunkVerifier/BatchProver/
BatchVerifier, ChunkProvingTask/BatchProvingTask/BundleProvingTask,
ChunkProofV2/BatchProofV2/BundleProof, ChunkInfo, load_params_map,
CHUNK_PROVER_DEGREES/BATCH_PROVER_DEGREES, INNER_DEGREE, mock proving.
"""
from .chunk_info import ChunkInfo, mock_padded_chunk_info_for_testing  # noqa: F401
from .tasks import BatchProvingTask, BundleProvingTask, ChunkProvingTask  # noqa: F401
from .proofs import BatchProofV2, BundleProof, ChunkProofV2  # noqa: F401
from .provers import (  # noqa: F401
    BATCH_PROVER_DEGREES, CHUNK_PROVER_DEGREES, BatchProver, BatchVerifier,
    ChunkProver, ChunkVerifier, load_params, load_params_map,
)
from .mock import mock_prove_target_circuit_chunk, mock_prove_witness_block  # noqa: F401
from ..zkevm import INNER_DEGREE  # noqa: F401

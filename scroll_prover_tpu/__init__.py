"""scroll_prover_tpu — a TPU-native Halo2-KZG zkEVM proving framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of
scroll-tech/scroll-prover (reference mounted read-only at /root/reference):
trace ingestion -> witness -> inner SNARK -> six-layer compression/aggregation
ladder (chunk -> batch -> bundle) -> EVM-verifiable proof.

Layer map (mirrors SURVEY.md section 1, redesigned TPU-first):
  fields/      L0 host field params + limb codecs (BN254 Fr/Fq, BLS12-381 Fr)
  ops/         L0 device kernels: limb-plane modular arithmetic, NTT, MSM,
               Poseidon, Keccak
  curve/       L0 G1/G2 point arithmetic (device limb planes + host reference,
               host pairing for verification)
  kzg/         L1 SRS management, KZG commit/open/multiopen, transcripts
  plonk/       L1 PLONKish constraint system, keygen, MockProver-equivalent,
               prover, verifier
  circuits/    L3 super-circuit frontend (subcircuit framework)
  witness/     L4 BlockTrace ingestion, witness building, capacity checker
  aggregation/ L3b batch data / blob codec / headers / aggregation circuits
  api/         L5/L6 prover facade (ChunkProver/BatchProver/... parity with
               the reference's consumed `prover` crate API, SURVEY.md 2.3)
  parallel/    device-mesh sharding: distributed MSM/NTT over ICI collectives
  cli/         L7 trace_prover / chain_prover entry points
  utils/       env/config/io/logging
"""

__version__ = "0.1.0"

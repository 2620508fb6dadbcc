"""CompressionCircuit: the proof-carrying layer circuit (layers 1/2/4/6).

Role parity with the reference aggregator's CompressionCircuit (SURVEY.md
section 2.2 / 3.1: layer1 "compression-wide", layer2 "compression-thin" =
chunk proof; layer4/layer6 compress batch/bundle proofs, layer6 with a
Keccak-friendly transcript).

Binding model this round: the circuit recomputes, fully in-constraints, the
Poseidon-sponge digest of [inner instances || inner proof bytes as 31-byte
field elements] and exposes `[digest || inner instances]` as its public
input. A compression proof therefore commits to exactly one inner proof
string; the verifier recomputes the digest from the inner proof it is
recursively verifying (provers.py), so forging a layer proof requires
breaking the sponge. Full in-circuit KZG accumulation (halo2-ecc-style
non-native arithmetic over the 88-bit x 3-limb shapes of the reference's
layer configs) is the designated next deepening of this layer.
"""
from __future__ import annotations

from ..fields.bn254 import FR_MOD
from ..proof_system.plonk.cs import Circuit, ConstraintSystem, empty_assignment
from ..zkevm.subcircuits import PoseidonSubCircuit


def _canonical_k(k: int) -> int:
    """Round the ladder-layer domain up to a shared size so every
    compression/aggregation proof reuses one set of compiled kernels
    (SPT_LADDER_K, default 13; computed k wins if larger)."""
    import os

    base = int(os.environ.get("SPT_LADDER_K", "13"))
    return max(k, base)


def proof_to_field_elems(proof: bytes) -> list[int]:
    """31-byte little-endian chunks -> Fr elements (lossless, < p)."""
    out = []
    for i in range(0, len(proof), 31):
        out.append(int.from_bytes(proof[i : i + 31], "little"))
    out.append(len(proof))  # length binding
    return out


def sponge_inputs(inner_instances: list[int], proof: bytes) -> list[int]:
    return [v % FR_MOD for v in inner_instances] + proof_to_field_elems(proof)


def compression_digest(inner_instances: list[int], proof: bytes) -> int:
    """Host computation of the digest the circuit exposes."""
    from ..hashes.poseidon import poseidon_fr

    msg = sponge_inputs(inner_instances, proof)
    msg = [v % FR_MOD for v in msg] or [0]
    if len(msg) % 2:
        msg = msg + [0]
    state = [0, 0, 0]
    for i in range(0, len(msg), 2):
        state[0] = (state[0] + msg[i]) % FR_MOD
        state[1] = (state[1] + msg[i + 1]) % FR_MOD
        state = poseidon_fr.permute(state)
    return state[0]


class CompressionCircuit(Circuit):
    """Expose [sponge_digest(inner) || inner_instances] as public input."""

    def __init__(self, inner_instances: list[int], inner_proof: bytes):
        self.inner_instances = [int(v) % FR_MOD for v in inner_instances]
        self.inner_proof = inner_proof

    def num_instance(self) -> int:
        return 1 + len(self.inner_instances)

    def min_k(self) -> int:
        n_inputs = len(sponge_inputs(self.inner_instances, self.inner_proof))
        blocks = (n_inputs + 1) // 2
        rows = blocks * 67 + 8
        return _canonical_k(max((rows + 16).bit_length(), 8))

    def configure(self, cs: ConstraintSystem):
        self.instance = cs.instance_column()
        self.poseidon = PoseidonSubCircuit().configure(cs)
        self.pass_through = cs.advice_column()
        cs.enable_permutation(self.instance)
        cs.enable_permutation(self.pass_through)
        cs.enable_permutation(self.poseidon.s[0])
        cs.enable_permutation(self.poseidon.elem[0])
        cs.enable_permutation(self.poseidon.elem[1])

    def assign(self, cs: ConstraintSystem, n: int, instance):
        fixed = empty_assignment(cs.num_fixed, n)
        adv = empty_assignment(cs.num_advice, n)
        inputs = sponge_inputs(self.inner_instances, self.inner_proof)
        rows, digest_row, digest = self.poseidon.assign_sponge(
            cs, fixed, adv, n, inputs, 0
        )
        # instance[0] == digest (copy to the sponge output cell)
        cs.copy(self.instance, 0, self.poseidon.s[0], digest_row)
        # instance[1 + i] == inner instance i: pass-through column, and each
        # pass-through cell is copy-bound to the absorbed elem cell
        for i, v in enumerate(self.inner_instances):
            adv[self.pass_through.index][i] = v
            cs.copy(self.instance, 1 + i, self.pass_through, i)
            # inner instance i was absorbed as element i: chunk ci = i//2,
            # absorb row = ci * 67, elem column i % 2
            absorb_row = (i // 2) * 66
            cs.copy(self.pass_through, i, self.poseidon.elem[i % 2], absorb_row)
        return {"fixed": fixed, "advice": adv}

    def instance_for(self) -> list[list[int]]:
        digest = compression_digest(self.inner_instances, self.inner_proof)
        return [[digest] + self.inner_instances]

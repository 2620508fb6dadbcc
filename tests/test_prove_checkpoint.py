"""Phase-level checkpoint/resume of the prover (plonk/checkpoint.py).

The production k=20 prove is a multi-hour tunneled-TPU run; round 4 lost
8/8 attempts to OOM/tunnel drops (VERDICT #1). These tests assert the
recovery contract on a small circuit: a prove resumed from ANY phase
boundary — or from a partially-written checkpoint — produces bit-identical
proof bytes, because the persisted seed + commitment bytes replay the
transcript exactly.
"""
import json
import os

import jax
import pytest

jax.config.update("jax_platforms", "cpu")

from scroll_prover_tpu.fields.bn254 import FR_MOD
from scroll_prover_tpu.proof_system import kzg
from scroll_prover_tpu.proof_system.plonk import Circuit
from scroll_prover_tpu.proof_system.plonk.checkpoint import ProveCheckpoint
from scroll_prover_tpu.proof_system.plonk.cs import empty_assignment
from scroll_prover_tpu.proof_system.plonk.keygen import keygen
from scroll_prover_tpu.proof_system.plonk.prover import prove
from scroll_prover_tpu.proof_system.plonk.verifier import verify
import scroll_prover_tpu.proof_system.plonk.prover as PR

K = 6


class C(Circuit):
    def configure(self, cs):
        self.a = cs.advice_column()
        self.b = cs.advice_column()
        self.c = cs.advice_column()
        self.sel = cs.selector()
        self.tbl = cs.fixed_column()
        self.pi = cs.instance_column()
        cs.gate(
            "mul",
            self.sel.query() * (self.a.query() * self.b.query() - self.c.query()),
        )
        cs.lookup("rng", [self.sel.query() * self.a.query()], [self.tbl.query()])

    def assign(self, cs, n, instance):
        fixed = empty_assignment(cs.num_fixed, n)
        adv = empty_assignment(cs.num_advice, n)
        for i in range(8):
            a, b = (7 + i) % 16, i + 5
            adv[self.a.index][i] = a
            adv[self.b.index][i] = b
            adv[self.c.index][i] = a * b % FR_MOD
            fixed[self.sel.index][i] = 1
        for i in range(16):
            fixed[self.tbl.index][i] = i
        cs.copy(self.pi, 0, self.a, 0)
        return {"fixed": fixed, "advice": adv}


INST = [[7]]


@pytest.fixture()
def lowmem(monkeypatch):
    monkeypatch.setattr(PR, "_LOWMEM", True)
    monkeypatch.setenv("SPT_LOWMEM", "1")
    monkeypatch.setenv("SPT_FORCE_STREAM", "1")  # coset-streaming quotient
    yield


def _prove_ckpt(tmp_path, name, reuse=None):
    srs = kzg.SRS.generate(K)
    ck = reuse if reuse is not None else ProveCheckpoint(
        str(tmp_path / name), fingerprint="fp-1"
    )
    circ = C()
    pk, vk = keygen(srs, K, circ, INST, ckpt=ck)
    proof = prove(srs, pk, circ, INST, ckpt=ck)
    assert verify(srs, vk, INST, proof)
    return proof, ck


def test_full_then_resume_identical(tmp_path, lowmem):
    p1, ck = _prove_ckpt(tmp_path, "ck")
    # everything cached: a fresh process state re-proves bit-identically
    p2, _ = _prove_ckpt(tmp_path, "ck")
    assert p2 == p1


def test_resume_from_each_phase(tmp_path, lowmem):
    p1, ck = _prove_ckpt(tmp_path, "ck")
    meta_path = os.path.join(ck.dir, "meta.json")
    # knock out suffixes of the phase sequence, simulating a crash at each
    # phase boundary; every resume must reproduce the same bytes
    phase_order = ["p1_advice", "p2_perm", "p3", "p4_h", "p6_w"]
    for cut in range(len(phase_order)):
        with open(meta_path) as fh:
            meta = json.load(fh)
        for tag in phase_order[cut:]:
            meta["points"].pop(tag, None)
        meta["scalars"].pop("p5_evals", None)
        with open(meta_path, "w") as fh:
            json.dump(meta, fh)
        if cut <= 1:
            for f in os.listdir(ck.dir):
                if f.startswith("lookup_") and cut == 0:
                    os.remove(os.path.join(ck.dir, f))
                if f.startswith("coset_") and cut <= 3:
                    os.remove(os.path.join(ck.dir, f))
        p, _ = _prove_ckpt(tmp_path, "ck")
        assert p == p1, f"resume after cutting {phase_order[cut:]} diverged"


def test_partial_cosets_resume(tmp_path, lowmem):
    p1, ck = _prove_ckpt(tmp_path, "ck")
    # wipe the later phases and HALF the quotient cosets
    with open(os.path.join(ck.dir, "meta.json")) as fh:
        meta = json.load(fh)
    for tag in ("p4_h", "p6_w"):
        meta["points"].pop(tag, None)
    meta["scalars"].pop("p5_evals", None)
    with open(os.path.join(ck.dir, "meta.json"), "w") as fh:
        json.dump(meta, fh)
    cosets = sorted(f for f in os.listdir(ck.dir) if f.startswith("coset_"))
    assert cosets, "stream quotient should have checkpointed cosets"
    for f in cosets[len(cosets) // 2 :]:
        os.remove(os.path.join(ck.dir, f))
    p, _ = _prove_ckpt(tmp_path, "ck")
    assert p == p1


def test_fingerprint_mismatch_resets(tmp_path, lowmem):
    _p1, ck = _prove_ckpt(tmp_path, "ck")
    ck2 = ProveCheckpoint(ck.dir, fingerprint="fp-2")
    assert not ck2.has_points("p1_advice")
    assert ck2.seed != ck.seed


def test_assign_cache_roundtrip(tmp_path, lowmem, monkeypatch):
    # same proof bytes with the assignment disk cache cold and warm
    monkeypatch.setenv("SPT_ASSIGN_CACHE", str(tmp_path / "assign"))
    p1, ck = _prove_ckpt(tmp_path, "ck")
    assert (tmp_path / "assign" / "advice.npy").exists()
    p2, _ = _prove_ckpt(tmp_path, "ck")  # warm: loads packed mmap columns
    assert p2 == p1
    # warm cache + no checkpoint: fresh proof still verifies
    srs = kzg.SRS.generate(K)
    circ = C()
    pk, vk = keygen(srs, K, circ, INST)
    proof = prove(srs, pk, circ, INST, seed=b"warm-assign")
    assert verify(srs, vk, INST, proof)


def test_bounded_residency_identical(tmp_path, lowmem, monkeypatch):
    """SPT_VALS_RESIDENT / SPT_ADVICE_COEFF_RESIDENT bound device
    residency (LRU value sources + lazy advice coeffs); proof bytes must
    be bit-identical to the unbounded path."""
    ref, _ck = _prove_ckpt(tmp_path, "ref")
    monkeypatch.setenv("SPT_VALS_RESIDENT", "2")
    monkeypatch.setenv("SPT_ADVICE_COEFF_RESIDENT", "1")
    got, _ = _prove_ckpt(tmp_path, "ref")  # resume same ckpt, bounded
    assert got == ref
    # and a FRESH bounded prove (no cache) still verifies
    srs = kzg.SRS.generate(K)
    circ = C()
    pk, vk = keygen(srs, K, circ, INST)
    proof = prove(srs, pk, circ, INST, seed=b"bounded")
    assert verify(srs, vk, INST, proof)

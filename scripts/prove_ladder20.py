"""Layer-1 compression of the k=20 chunk inner proof ON THE TPU
(VERDICT round-4 #5: "raise the ladder toward production degrees ...
with the TPU proving them").

Consumes the artifacts prove_chunk20.py --prove dumps
(outputs/chunk20_*/{proof.hex,vk_chunk_inner.vkey,instance.json}),
builds the in-circuit SNARK verifier over the inner (the reference
layer1 CompressionCircuit role, integration/configs/layer1.config), and
proves it with the CHECKPOINTED prover. At 16 builder lanes the ~20M-op
verifier gadget packs into a k~21 domain — the reference's layer3/5
degree; its layer1 runs the same gadget sparser at degree 24
(integration/configs/layer{1,3}.config).

Usage: python scripts/prove_ladder20.py [--artifact-dir outputs/chunk20_X]
"""
from __future__ import annotations

import argparse
import glob
import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--artifact-dir", default=None)
    # 32 lanes pack the ~20.7M-op verifier gadget over the k=20 real
    # inner into a k=20 domain (~647k builder rows): 224 advice columns
    # x 32 MB beats 16-lane k=21's 149 x 64 MB on a 16 GB chip, and
    # every domain op halves
    ap.add_argument("--lanes", type=int, default=32)
    ap.add_argument("--lookup-cols", type=int, default=64)
    # Keccak transcript by default: the layer1 output doubles as the
    # EVM-facing proof (the reference's FINAL compression layer proves
    # with a Keccak transcript for exactly this reason — SURVEY §3.2
    # layer6). --poseidon keeps the inner-ladder transcript instead.
    ap.add_argument("--poseidon", action="store_true")
    args = ap.parse_args()

    art = args.artifact_dir
    if art is None:
        cands = sorted(
            d for d in glob.glob(os.path.join(REPO, "outputs", "chunk20_*"))
            if os.path.exists(os.path.join(d, "vk_chunk_inner.vkey"))
        )
        assert cands, "no chunk20 artifact dir with a vk found"
        art = cands[-1]
    print(f"[ladder] inner artifacts: {art}", flush=True)

    os.environ["SPT_BUILDER_LANES"] = str(args.lanes)
    os.environ["SPT_BUILDER_LOOKUP_COLS"] = str(args.lookup_cols)
    os.environ.setdefault("SPT_PACK_RESIDENT", "1")
    os.environ.setdefault("SPT_LOWMEM", "1")
    os.environ.setdefault("SPT_COSET_CACHE_COLS", "40")
    os.environ.setdefault("SPT_COMMIT_BATCH", "2")
    os.environ.setdefault("SPT_KEYGEN_COMMIT_BATCH", "6")
    os.environ.setdefault("SPT_NTT_BATCH_BUDGET", str(1 << 21))

    import logging
    import threading

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    wd_s = float(os.environ.get("SPT_WATCHDOG_S", "1800"))
    beat = [time.time()]

    class _Beat(logging.Handler):
        def emit(self, record):
            beat[0] = time.time()

    logging.getLogger().addHandler(_Beat())

    def _watch():
        while True:
            time.sleep(60)
            if time.time() - beat[0] > wd_s:
                print("[watchdog] stalled — aborting for resume", flush=True)
                os._exit(3)

    threading.Thread(target=_watch, daemon=True).start()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from scroll_prover_tpu.proof_system import kzg
    from scroll_prover_tpu.proof_system.plonk.checkpoint import ProveCheckpoint
    from scroll_prover_tpu.proof_system.plonk.keygen import VerifyingKey, keygen
    from scroll_prover_tpu.proof_system.plonk.prover import prove as plonk_prove
    from scroll_prover_tpu.proof_system.plonk.verifier import verify as plonk_verify
    from scroll_prover_tpu.proof_system.transcript import (
        KeccakTranscript, PoseidonTranscript,
    )
    from scroll_prover_tpu.prover.verifier_circuit import VerifierCircuit

    tr_cls = PoseidonTranscript if args.poseidon else KeccakTranscript
    tr_name = "poseidon" if args.poseidon else "keccak"

    with open(os.path.join(art, "vk_chunk_inner.vkey"), "rb") as fh:
        inner_vk = VerifyingKey.from_bytes(fh.read())
    with open(os.path.join(art, "proof.hex")) as fh:
        inner_proof = bytes.fromhex(fh.read().strip())
    with open(os.path.join(art, "instance.json")) as fh:
        inner_inst = [int(v) for v in json.load(fh)]

    t0 = time.time()
    comp = VerifierCircuit(inner_vk, inner_proof, inner_inst)
    k = comp.min_k()
    print(f"[{time.time()-t0:7.1f}s] layer1 verifier circuit min_k={k}", flush=True)

    fp = hashlib.sha256(
        json.dumps(
            [hashlib.sha256(inner_proof).hexdigest(), k, args.lanes,
             args.lookup_cols, tr_name]
        ).encode()
    ).hexdigest()[:16]
    ckpt = ProveCheckpoint(
        os.path.join(REPO, ".bench_cache", f"ladder20_ckpt_{fp}"),
        fingerprint=fp,
    )
    os.environ["SPT_ASSIGN_CACHE"] = os.path.join(
        REPO, ".bench_cache", f"ladder20_assign_{fp}"
    )

    t_srs = time.time()
    srs = kzg.SRS.generate_fast(k)
    print(f"[{time.time()-t0:7.1f}s] SRS 2^{k} ({time.time()-t_srs:.1f}s)", flush=True)
    t_kg = time.time()
    pk, vk = keygen(srs, k, comp, ckpt=ckpt)
    print(f"[{time.time()-t0:7.1f}s] keygen done ({time.time()-t_kg:.1f}s)", flush=True)
    ci = comp.instance_for()
    t_pr = time.time()
    proof = plonk_prove(srs, pk, comp, ci, ckpt=ckpt, transcript_cls=tr_cls)
    prove_s = time.time() - t_pr
    print(f"[{time.time()-t0:7.1f}s] layer1 prove done ({prove_s:.1f}s)", flush=True)
    from scroll_prover_tpu.proof_system.plonk.verifier import acc_from_limbs
    from scroll_prover_tpu.prover.verifier_circuit import ACC_CELLS

    ok = plonk_verify(
        srs, vk, ci, proof, transcript_cls=tr_cls,
        fold_accumulator=acc_from_limbs(ci[0][:ACC_CELLS]),
    )
    assert ok, "layer1 proof failed verification"
    print(
        f"[{time.time()-t0:7.1f}s] layer1 VERIFIED ({tr_name} transcript, "
        "inner accumulator folded)", flush=True,
    )

    record = {
        "tier": "ladder-layer1",
        "k": k,
        "lanes": args.lanes,
        "transcript": tr_name,
        "inner_proof_sha256": hashlib.sha256(inner_proof).hexdigest(),
        "proof_len": len(proof),
        "proof_sha256": hashlib.sha256(proof).hexdigest(),
        "prove_wall_s": round(prove_s, 2),
        "verified": True,
        "ts": time.time(),
    }
    with open(os.path.join(art, "layer1.json"), "w") as fh:
        json.dump(record, fh, indent=1)
    with open(os.path.join(art, "layer1_proof.hex"), "w") as fh:
        fh.write(proof.hex())
    with open(os.path.join(art, "vk_layer1.vkey"), "wb") as fh:
        fh.write(vk.to_bytes())
    from scroll_prover_tpu.prover.protocol import protocol_from_vk

    with open(os.path.join(art, "layer1.protocol"), "w") as fh:
        json.dump(protocol_from_vk(vk, len(ci[0])), fh, indent=1)
    print(json.dumps(record), flush=True)

    if not args.poseidon:
        # EVM-facing tail (reference layer6 role): emit the full
        # in-bytecode verifier for the layer1 proof and replay it in the
        # mini-EVM — the release-artifact core (proof + pi + verifier +
        # gas). Failures here must not lose the proof artifacts above.
        try:
            from scroll_prover_tpu.evm.full_verifier import (
                gen_full_verifier, proof_calldata,
            )
            from scroll_prover_tpu.evm.interpreter import deploy_and_call

            t_ev = time.time()
            code, yul = gen_full_verifier(
                vk, srs, len(ci[0]), has_accumulator=True,
            )
            calldata = proof_calldata(ci[0], proof)
            gas = deploy_and_call(code, calldata)
            print(
                f"[{time.time()-t0:7.1f}s] EVM verifier accepts layer1 "
                f"proof, gas={gas} ({time.time()-t_ev:.1f}s)",
                flush=True,
            )
            with open(os.path.join(art, "evm_verifier.bin"), "wb") as fh:
                fh.write(code)
            with open(os.path.join(art, "evm_verifier.yul"), "w") as fh:
                fh.write(yul)
            with open(os.path.join(art, "pi_layer1.data"), "wb") as fh:
                fh.write(b"".join(int(v).to_bytes(32, "big") for v in ci[0]))
            with open(os.path.join(art, "proof_layer1.data"), "wb") as fh:
                fh.write(proof)
            record["evm_gas"] = int(gas)
            with open(os.path.join(art, "layer1.json"), "w") as fh:
                json.dump(record, fh, indent=1)
        except Exception as e:  # noqa: BLE001 — keep the proof artifacts
            print(f"[ladder] EVM verifier stage failed: {e!r}", flush=True)


if __name__ == "__main__":
    main()

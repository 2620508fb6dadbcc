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
    ap.add_argument("--lanes", type=int, default=16)
    ap.add_argument("--lookup-cols", type=int, default=64)
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
    from scroll_prover_tpu.prover.verifier_circuit import VerifierCircuit

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
             args.lookup_cols]
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
    proof = plonk_prove(srs, pk, comp, ci, ckpt=ckpt)
    prove_s = time.time() - t_pr
    print(f"[{time.time()-t0:7.1f}s] layer1 prove done ({prove_s:.1f}s)", flush=True)
    ok = plonk_verify(srs, vk, ci, proof)
    assert ok, "layer1 proof failed verification"
    print(f"[{time.time()-t0:7.1f}s] layer1 VERIFIED", flush=True)

    record = {
        "tier": "ladder-layer1",
        "k": k,
        "lanes": args.lanes,
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
    print(json.dumps(record), flush=True)


if __name__ == "__main__":
    main()

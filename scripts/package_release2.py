"""Package the two-layer TPU release (release-v0.5.0).

The reference's release-v0.13.1 packages the OUTERMOST proof + pi +
EVM verifier + vkeys + protocol + sha256 manifest (release.sh:9-41).
This packager does the same for the round-5 production artifacts:

  layer0 (inner): real mainnet chunk at INNER_DEGREE=20, proven on the
      TPU by scripts/prove_chunk20.py --prove (Poseidon transcript).
  layer1: in-circuit SNARK verifier over the inner, proven on the TPU
      by scripts/prove_ladder20.py with a KECCAK transcript (the
      reference's EVM-facing final-layer role) + the generated
      in-bytecode verifier and its accepted replay gas.

Layers 2-6 of the reference ladder are absent: with the round-5 inner
(~460 columns) every recursion layer is a k>=21 circuit — see
docs/ROUND5.md for the infeasibility numbers on CPU and the TPU
schedule. The layout is honest about that: files are named layer1, not
bundle_recursion.

Usage: python scripts/package_release2.py [artifact_dir] [release_dir]
       (defaults: newest outputs/chunk20_* with a layer1.json;
        release-v0.5.0)
"""
import glob
import hashlib
import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    art = sys.argv[1] if len(sys.argv) > 1 else None
    rel = sys.argv[2] if len(sys.argv) > 2 else os.path.join(REPO, "release-v0.5.0")
    if art is None:
        cands = sorted(
            d for d in glob.glob(os.path.join(REPO, "outputs", "chunk20_*"))
            if os.path.exists(os.path.join(d, "layer1.json"))
        )
        assert cands, "no chunk20 artifact dir with a completed layer1"
        art = cands[-1]

    with open(os.path.join(art, "layer1.json")) as fh:
        l1 = json.load(fh)
    assert l1.get("verified") is True and l1.get("transcript") == "keccak"
    assert "evm_gas" in l1, "layer1 run did not produce an EVM replay"
    with open(os.path.join(art, "chunk20.json")) as fh:
        inner = json.load(fh)
    assert inner.get("verified") is True and inner.get("k") == 20

    os.makedirs(rel, exist_ok=True)
    files = [
        # inner (chunk) layer
        ("proof.hex", "chunk_inner_proof.hex"),
        ("vk_chunk_inner.vkey", "vk_chunk_inner.vkey"),
        ("instance.json", "chunk_inner_instance.json"),
        ("chunk20.json", "chunk_inner.json"),
        # layer1 (EVM-facing)
        ("proof_layer1.data", "proof_layer1.data"),
        ("pi_layer1.data", "pi_layer1.data"),
        ("vk_layer1.vkey", "vk_layer1.vkey"),
        ("layer1.protocol", "layer1.protocol"),
        ("layer1.json", "layer1.json"),
        ("evm_verifier.bin", "evm_verifier.bin"),
        ("evm_verifier.yul", "evm_verifier.yul"),
    ]
    for src, dst in files:
        shutil.copyfile(os.path.join(art, src), os.path.join(rel, dst))

    # inner protocol JSON from the released vk (reference chunk.protocol)
    from scroll_prover_tpu.proof_system.plonk.keygen import VerifyingKey
    from scroll_prover_tpu.prover.protocol import protocol_from_vk

    with open(os.path.join(rel, "vk_chunk_inner.vkey"), "rb") as fh:
        ivk = VerifyingKey.from_bytes(fh.read())
    with open(os.path.join(rel, "chunk_inner_instance.json")) as fh:
        n_inst = len(json.load(fh))
    with open(os.path.join(rel, "chunk_inner.protocol"), "w") as fh:
        json.dump(protocol_from_vk(ivk, n_inst), fh, indent=1)

    manifest = []
    for name in sorted(os.listdir(rel)):
        if name == "sha256sum":
            continue
        with open(os.path.join(rel, name), "rb") as fh:
            manifest.append(f"{hashlib.sha256(fh.read()).hexdigest()}  {name}")
    with open(os.path.join(rel, "sha256sum"), "w") as fh:
        fh.write("\n".join(manifest) + "\n")
    print(f"packaged {len(files) + 2} files into {rel}")
    print(json.dumps({"inner": inner, "layer1": l1}, indent=1))


if __name__ == "__main__":
    main()

"""Produce golden release artifacts (reference release-v0.13.1 parity).

Runs the full six-layer ladder end-to-end (chunk -> batch -> bundle ->
EVM verify), serializing every verifying key into an assets dir, then
packages: evm_verifier.{yul,bin}, pi_bundle_recursion.data,
proof_bundle_recursion.data, full_proof_*.json, vk_*.vkey, chunk.protocol
and a sha256sum manifest — the same artifact set release.sh:9-41 packages
in the reference. tests/test_release_artifacts.py replays these with NO
proving, mirroring unit_tests.rs:22-65.

Usage: python scripts/make_release.py [release_dir]  (default release-v0.3.0)
"""
import os, sys, time, json, logging, subprocess, tempfile

# Fixture: a REAL mainnet chunk by default (batch_25/chunk_112 — 10
# blocks, 10 sigs; the k=20 single-chip anchor, scripts/prove_chunk20.py).
# SPT_RELEASE_SYNTHETIC=1 keeps the old synthetic trace (fast CI tier).
# Ladder domains: SPT_LADDER_K (default here 20 — the TPU-first
# production scale; reference layer configs run k=21..26 on hundreds of
# GB of host RAM, our wide-lane builder packs the same op count into
# k=20 domains on a 16 GB chip — docs/PERF.md round 4).
_REAL_FIXTURE = (
    "/root/reference/integration/tests/extra_traces/batch_25/chunk_112"
)
if not os.environ.get("SPT_RELEASE_SYNTHETIC"):
    os.environ.setdefault("SPT_LADDER_K", "20")
    os.environ.setdefault("SPT_INNER_K", "20")
    os.environ.setdefault("SPT_BUILDER_LANES", "4")
    os.environ.setdefault("SPT_BUILDER_LOOKUP_COLS", "16")
    os.environ.setdefault("SPT_ECC_CAP", "0")
    os.environ.setdefault("SPT_MODEXP_CAP", "0")
    os.environ.setdefault("SPT_KECCAK_CAP", "1000000")
    os.environ.setdefault("SPT_MPT_CAP", "1000000")
    os.environ.setdefault("SPT_SIG_CAP", "10")  # chunk_112 demand
    # single-chip HBM choreography for the 200-column inner at k=20
    os.environ.setdefault("SPT_PACK_RESIDENT", "1")
    os.environ.setdefault("SPT_LOWMEM", "1")
    os.environ.setdefault("SPT_COSET_CACHE_COLS", "48")

# default: ambient backend (the attached TPU when present — the recursion
# layers' k~21 SRS/commits/NTTs are hours on host CPU, minutes on device);
# SPT_RELEASE_CPU=1 forces the CPU mesh (CI / no-chip environments)
import jax

if os.environ.get("SPT_RELEASE_CPU"):
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))
logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")

from scroll_prover_tpu.aggregator import BatchHeader  # noqa: E402
from scroll_prover_tpu.integration import (  # noqa: E402
    get_blob_from_chunks, prove_and_verify_batch, prove_and_verify_bundle,
    prove_and_verify_chunk,
)
from scroll_prover_tpu.prover import BatchProver  # noqa: E402
from scroll_prover_tpu.prover.tasks import BatchProvingTask, BundleProvingTask  # noqa: E402

t0 = time.time()
mark = lambda m: print(f"[{time.time()-t0:7.1f}s] {m}", flush=True)

rel = sys.argv[1] if len(sys.argv) > 1 else "release-v0.3.0"
out = tempfile.mkdtemp(prefix="release_out_")
assets = tempfile.mkdtemp(prefix="release_assets_")
params = {}

if os.environ.get("SPT_RELEASE_SYNTHETIC"):
    from test_witness_ccc import synthetic_trace  # noqa: E402

    traces = [synthetic_trace()]
else:
    import glob as _glob

    from scroll_prover_tpu.l2types.block_trace import (  # noqa: E402
        get_block_trace_from_file,
    )

    files = sorted(
        _glob.glob(os.path.join(_REAL_FIXTURE, "block_*.json")),
        key=lambda p: int(p.split("block_")[1].split(".")[0]),
    )
    traces = [get_block_trace_from_file(f) for f in files]
    mark(f"real fixture: {len(traces)} blocks from {_REAL_FIXTURE}")

mark("chunk proving...")
chunk_proof = prove_and_verify_chunk(params, assets, traces, "0", out)
mark("chunk proof verified")
# chunk.protocol (reference dump_chunk_protocol -> chunk_chunk_0.protocol)
with open(os.path.join(out, "chunk_chunk_0.protocol"), "w") as fh:
    json.dump(chunk_proof.inner.layers[-1].protocol, fh, indent=1)

infos = [chunk_proof.inner.chunk_info()]
blob = get_blob_from_chunks(infos)
header = BatchHeader.construct_from_chunks(4, 0, 0, 0, b"\x00" * 32, 5, infos, blob)
task = BatchProvingTask([chunk_proof], header, blob)
mark("batch proving...")
batch_proof = prove_and_verify_batch(params, assets, task, out)
mark("batch proof verified")
bundle = prove_and_verify_bundle(
    params, assets, BundleProvingTask([batch_proof]), out
)
mark("bundle proof verified")
bp = BatchProver.from_params_and_assets(params, assets)
gas = bp.evm_verify_bundle(bundle, out)
mark(f"EVM verification gas={gas}")
assert gas and gas > 100_000

env = dict(os.environ, ASSETS_DIR=assets)
subprocess.run(
    ["bash", os.path.join(os.path.dirname(os.path.abspath(__file__)), "release.sh"), out, rel],
    check=True, env=env,
)
mark(f"RELEASE PACKAGED in {rel}")

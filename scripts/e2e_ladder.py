import os, time, logging
os.environ['JAX_PLATFORMS']='cpu'
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import sys; sys.path.insert(0,'/root/repo'); sys.path.insert(0,'/root/repo/tests')
logging.basicConfig(level=logging.INFO, format='%(asctime)s %(message)s')
t0=time.time()
def mark(m): print(f'[{time.time()-t0:7.1f}s] {m}', flush=True)
from scroll_prover_tpu.integration import (get_blob_from_chunks,
    prove_and_verify_batch, prove_and_verify_bundle, prove_and_verify_chunk)
# default: REAL mainnet fixture chunk (SPT_E2E_SYNTHETIC=1 for the fast
# synthetic trace; scripts/make_release.py is the production-scale run)
if os.environ.get('SPT_E2E_SYNTHETIC'):
    from test_witness_ccc import synthetic_trace
    _traces = [synthetic_trace()]
else:
    import glob as _glob
    from scroll_prover_tpu.l2types.block_trace import get_block_trace_from_file
    _fix = os.environ.get(
        'SPT_E2E_FIXTURE',
        '/root/reference/integration/tests/extra_traces/batch_25/chunk_112')
    _files = sorted(_glob.glob(os.path.join(_fix, 'block_*.json')),
                    key=lambda p: int(p.split('block_')[1].split('.')[0]))
    _traces = [get_block_trace_from_file(f) for f in _files]
from scroll_prover_tpu.aggregator import BatchHeader
from scroll_prover_tpu.prover.tasks import BatchProvingTask, BundleProvingTask
from scroll_prover_tpu.prover import BatchProver
import tempfile
params = {}
mark('chunk proving...')
chunk_proof = prove_and_verify_chunk(params, "", _traces, "c0")
mark('chunk proof verified')
infos = [chunk_proof.inner.chunk_info()]
blob = get_blob_from_chunks(infos)
header = BatchHeader.construct_from_chunks(4, 0, 0, 0, b"\x00"*32, 5, infos, blob)
task = BatchProvingTask([chunk_proof], header, blob)
mark('batch proving...')
batch_proof = prove_and_verify_batch(params, "", task)
mark('batch proof verified')
out = tempfile.mkdtemp()
bundle = prove_and_verify_bundle(params, "", BundleProvingTask([batch_proof]), out)
mark('bundle proof verified')
bp = BatchProver.from_params_and_assets(params, "")
gas = bp.evm_verify_bundle(bundle, out)
mark(f'EVM verification gas={gas}')
import os as _os
print('artifacts:', sorted(_os.listdir(out)), flush=True)
assert gas and gas > 100_000
mark('FULL LADDER OK')

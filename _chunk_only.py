import os, time, logging
os.environ['JAX_PLATFORMS']='cpu'
os.environ['XLA_FLAGS']='--xla_force_host_platform_device_count=8'
import jax; jax.config.update('jax_platforms','cpu')
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import sys; sys.path.insert(0,'/root/repo'); sys.path.insert(0,'/root/repo/tests')
logging.basicConfig(level=logging.INFO, format='%(asctime)s %(message)s')
from test_witness_ccc import synthetic_trace
from scroll_prover_tpu.integration import prove_and_verify_chunk
t0=time.time()
proof = prove_and_verify_chunk({}, "", [synthetic_trace()], "c0")
print(f'CHUNK OK {time.time()-t0:.0f}s', flush=True)

import time, numpy as np, jax, jax.numpy as jnp
from scroll_prover_tpu.fields.limbs import FR_LIMB
from scroll_prover_tpu.ops import field_ops as fo
from scroll_prover_tpu.ops.ntt import EvaluationDomain
from scroll_prover_tpu.ops.ntt_fast import FastDomain
def force(x): np.asarray(x[0,0]); return x
def mark(m): print(f'[{time.strftime("%H:%M:%S")}] {m}', flush=True)
K=20
fast20 = FastDomain(K)
x20 = fo.to_mont(FR_LIMB, jnp.asarray(fo.rand_elements(FR_LIMB, np.random.default_rng(1), 1<<K)))
force(x20); mark('input resident')
t0=time.perf_counter(); force(fast20.ntt(x20)); mark(f'compile+first: {time.perf_counter()-t0:.1f}s')
tiny = jax.jit(lambda v: v + jnp.uint32(0)); force(tiny(x20))
t0=time.perf_counter(); force(tiny(x20)); rtt = time.perf_counter()-t0
REPS=8
t0=time.perf_counter()
y = x20
for _ in range(REPS): y = fast20.ntt(y)
force(y); dt=(time.perf_counter()-t0-rtt)/REPS
mark(f'2^20 fast NTT: {dt*1000:.2f} ms (rtt {rtt*1000:.0f} ms)')
dom = EvaluationDomain(K)
want = dom.ntt(x20); got = fast20.ntt(x20)
same = np.asarray(jnp.all(got[:4096] == want[:4096]))
mark(f'first 4096 outputs match scan NTT: {bool(same)}')

import time, functools, numpy as np, jax, jax.numpy as jnp
from scroll_prover_tpu.fields.limbs import FR_LIMB
from scroll_prover_tpu.ops import field_ops as fo
from scroll_prover_tpu.ops.ntt import EvaluationDomain
from scroll_prover_tpu.ops.ntt_fast import FastDomain
def force(x): np.asarray(x[0,0]); return x
import sys
def mark(m):
    print(f'[{time.strftime("%H:%M:%S")}] {m}', flush=True)
K=20
mark('building FastDomain')
fast20 = FastDomain(K)
mark('domain built')
x20 = fo.to_mont(FR_LIMB, jnp.asarray(fo.rand_elements(FR_LIMB, np.random.default_rng(1), 1<<K)))
force(x20)
mark('input resident')
f = jax.jit(lambda v: fast20.ntt(v))
t0=time.perf_counter(); force(f(x20)); print(f'compile+first: {time.perf_counter()-t0:.1f}s', flush=True)
tiny = jax.jit(lambda v: v + jnp.uint32(0)); force(tiny(x20))
t0=time.perf_counter(); force(tiny(x20)); rtt = time.perf_counter()-t0
REPS=8
g = jax.jit(lambda v: functools.reduce(lambda a,_: fast20.ntt(a), range(REPS), v))
force(g(x20))
t0=time.perf_counter(); force(g(x20)); dt=(time.perf_counter()-t0-rtt)/REPS
print(f'2^20 fast NTT: {dt*1000:.2f} ms (rtt {rtt*1000:.0f} ms)', flush=True)
dom = EvaluationDomain(K)
want = dom.ntt(x20); got = f(x20)
same = np.asarray(jnp.all(got[:4096] == want[:4096]))
print('first 4096 outputs match scan NTT:', bool(same), flush=True)

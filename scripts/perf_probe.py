"""Ad-hoc device microbenchmarks for the prover hot ops (round 3).

Times, with readback-forced completion minus measured RTT:
  * composed mont_mul vs transposed lm_mul at 2^20..2^22 rows
  * TiledDomain ntt single vs ntt_batch(C=4) at k=20
Usage: python scripts/perf_probe.py [stage...]
"""
import os, sys, time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp
import numpy as np

from scroll_prover_tpu.fields.limbs import FR_LIMB
from scroll_prover_tpu.ops import field_ops as fo

F = FR_LIMB


def _force(x):
    np.asarray(x.reshape(-1)[0])


def _rtt(x):
    tiny = jax.jit(lambda v: v + jnp.uint32(0))
    _force(tiny(x))
    t0 = time.perf_counter()
    _force(tiny(x))
    return time.perf_counter() - t0


def timeit(fn, x, reps=4):
    y = fn(x)
    _force(y)  # compile+warm
    rtt = _rtt(x)
    t0 = time.perf_counter()
    y = x
    for _ in range(reps):
        y = fn(y)
    _force(y)
    return max((time.perf_counter() - t0) - rtt, 1e-9) / reps


def stage_mul():
    from scroll_prover_tpu.ops.ntt_tile import lm_mul

    rng = np.random.default_rng(0)
    for k in (20, 21, 22):
        n = 1 << k
        x = fo.to_mont(F, jnp.asarray(fo.rand_elements(F, rng, n)))
        _force(x)
        composed = jax.jit(lambda v: fo.mont_mul(F, v, v))
        t_c = timeit(composed, x)

        def lm(v):
            vt = v.T
            return lm_mul(vt, vt).T

        t_l = timeit(lm, x)
        xt = jnp.asarray(np.asarray(x).T.copy())
        _force(xt)
        t_lraw = timeit(lambda v: lm_mul(v, v), xt)
        print(f"mul 2^{k}: composed {t_c*1e3:.1f} ms | lm+T {t_l*1e3:.1f} ms"
              f" | lm raw {t_lraw*1e3:.1f} ms", flush=True)


def stage_nttb():
    from scroll_prover_tpu.ops.ntt_tile import TiledDomain

    rng = np.random.default_rng(0)
    k = 20
    dom = TiledDomain(k)
    x = fo.to_mont(F, jnp.asarray(fo.rand_elements(F, rng, 1 << k)))
    t1 = timeit(dom.ntt, x)
    xb = jnp.stack([x, x, x, x])
    tb = timeit(lambda v: jnp.stack(dom.ntt_batch(v)), xb, reps=2)
    print(f"ntt k=20: single {t1*1e3:.1f} ms | batch4 {tb*1e3:.1f} ms"
          f" ({tb/4*1e3:.1f} ms/col)", flush=True)


STAGES = {"mul": stage_mul, "nttb": stage_nttb}

if __name__ == "__main__":
    names = sys.argv[1:] or list(STAGES)
    for nm in names:
        STAGES[nm]()

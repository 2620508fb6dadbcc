"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes (learned on the axon-tunneled backend):
  * `block_until_ready()` does NOT actually block — force completion by
    reading back one element and subtract the measured round-trip latency.
  * Full-array readback rides a ~14 MB/s tunnel; never read back 64 MB.

Headline: 2^20 Fr NTT wall-clock (the inner-circuit domain size, reference
README.md:21 / BASELINE.md). Implementation: the fused four-step tile
engine (ops/ntt_tile.py; ~30 ms measured on TPU v5 lite) with the
limb-major butterfly path (ops/ntt_fast.py; 140 ms) and the scan engine
(ops/ntt.py; 424 ms) as fallbacks. The reference publishes no numbers;
vs_baseline uses a ~0.35 s estimate for the rayon radix-2 FFT at 2^20 on a
server CPU (halo2 fork, SURVEY.md L1). >1 means faster.
"""
from __future__ import annotations

import json
import time

import numpy as np

RUST_CPU_NTT_2POW20_S = 0.35  # estimated reference anchor (no published number)
K = 20
REPS = 6


def _force(x) -> None:
    np.asarray(x[0, 0])


def _bench_tiled(xm) -> float:
    import jax
    import jax.numpy as jnp

    from scroll_prover_tpu.ops.ntt_tile import TiledDomain

    dom = TiledDomain(K)
    _force(dom.ntt(xm))  # compile + warm (one-time)
    tiny = jax.jit(lambda v: v + jnp.uint32(0))
    _force(tiny(xm))
    t0 = time.perf_counter()
    _force(tiny(xm))
    rtt = time.perf_counter() - t0
    y = xm
    t0 = time.perf_counter()
    for _ in range(REPS):
        y = dom.ntt(y)
    _force(y)
    return max((time.perf_counter() - t0) - rtt, 1e-9) / REPS


def _bench_fast(xm) -> float:
    import jax
    import jax.numpy as jnp

    from scroll_prover_tpu.ops.ntt_fast import FastDomain

    dom = FastDomain(K)
    _force(dom.ntt(xm))  # compile + warm (one-time)
    tiny = jax.jit(lambda v: v + jnp.uint32(0))
    _force(tiny(xm))
    t0 = time.perf_counter()
    _force(tiny(xm))
    rtt = time.perf_counter() - t0
    y = xm
    t0 = time.perf_counter()
    for _ in range(REPS):
        y = dom.ntt(y)
    _force(y)
    return max((time.perf_counter() - t0) - rtt, 1e-9) / REPS


def _bench_scan(xm) -> float:
    import jax
    import jax.numpy as jnp

    from scroll_prover_tpu.ops.ntt import EvaluationDomain

    dom = EvaluationDomain(K)

    @jax.jit
    def chained(v):
        for _ in range(4):
            v = dom.ntt(v)
        return v

    _force(chained(xm))
    tiny = jax.jit(lambda v: v + jnp.uint32(0))
    _force(tiny(xm))
    t0 = time.perf_counter()
    _force(tiny(xm))
    rtt = time.perf_counter() - t0
    t0 = time.perf_counter()
    _force(chained(xm))
    return max((time.perf_counter() - t0) - rtt, 1e-9) / 4


def main():
    import jax.numpy as jnp

    from scroll_prover_tpu.fields.limbs import FR_LIMB
    from scroll_prover_tpu.ops import field_ops as fo

    rng = np.random.default_rng(0)
    x = jnp.asarray(fo.rand_elements(FR_LIMB, rng, 1 << K))
    xm = fo.to_mont(FR_LIMB, x)
    _force(xm)

    impl = "pallas-tile"
    try:
        dt = _bench_tiled(xm)
    except Exception:
        try:
            impl = "pallas"
            dt = _bench_fast(xm)
        except Exception:
            impl = "scan-fallback"
            dt = _bench_scan(xm)

    print(
        json.dumps(
            {
                "metric": f"ntt_fr_2pow{K}_wall_s_{impl}",
                "value": round(dt, 6),
                "unit": "s",
                "vs_baseline": round(RUST_CPU_NTT_2POW20_S / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

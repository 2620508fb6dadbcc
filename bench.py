"""Benchmark entry point (run by the driver on real TPU hardware).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measurement notes (learned the hard way on the axon-tunneled backend):
  * `block_until_ready()` does NOT actually block on the remote TPU — it
    returns before execution finishes, so naive timing reports microseconds
    for 300 ms kernels.
  * Full-array readback rides a ~14 MB/s tunnel; 64 MB costs ~4.6 s.
  So: chain REPS transforms inside ONE jit, force completion by reading back
  a single dependent element, and subtract the measured round-trip latency.

Headline: 2^20 Fr NTT wall-clock (the inner-circuit domain size, reference
README.md:21 / BASELINE.md). The reference publishes no numbers
(BASELINE.md); vs_baseline uses a ~0.35 s estimate for the rayon radix-2 FFT
at 2^20 on a server CPU (halo2 fork, SURVEY.md L1). >1 means faster.
"""
from __future__ import annotations

import json
import time

import numpy as np

RUST_CPU_NTT_2POW20_S = 0.35  # estimated reference anchor (no published number)
K = 20
REPS = 4


def _force(x) -> None:
    """Truly wait for completion: read back one dependent element."""
    np.asarray(x[0, 0])


def main():
    import jax
    import jax.numpy as jnp

    from scroll_prover_tpu.fields.limbs import FR_LIMB
    from scroll_prover_tpu.ops import field_ops as fo
    from scroll_prover_tpu.ops.ntt import EvaluationDomain

    dom = EvaluationDomain(K)
    rng = np.random.default_rng(0)
    x = jnp.asarray(fo.rand_elements(FR_LIMB, rng, 1 << K))
    xm = fo.to_mont(FR_LIMB, x)
    _force(xm)

    @jax.jit
    def chained(v):
        for _ in range(REPS):
            v = dom.ntt(v)
        return v

    _force(chained(xm))  # compile + warm

    # round-trip latency of a no-op dispatch + 1-element readback
    tiny = jax.jit(lambda v: v + jnp.uint32(0))
    _force(tiny(xm))
    t0 = time.perf_counter()
    _force(tiny(xm))
    rtt = time.perf_counter() - t0

    t0 = time.perf_counter()
    _force(chained(xm))
    dt = max((time.perf_counter() - t0) - rtt, 1e-9) / REPS

    print(
        json.dumps(
            {
                "metric": f"ntt_fr_2pow{K}_wall_s",
                "value": round(dt, 6),
                "unit": "s",
                "vs_baseline": round(RUST_CPU_NTT_2POW20_S / dt, 3),
            }
        )
    )


if __name__ == "__main__":
    main()

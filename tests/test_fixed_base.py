"""Fixed-base device paths: composed-op scan (CPU tier) and the Pallas
window-walk kernel (slow tier, interpret mode).

The kernel is also validated on silicon every bench run (SRS synthesis in
stage_prove20); reference capability anchor: ceremony-params loading,
integration/tests/integration.rs:12-22.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from scroll_prover_tpu.curves.bn254_curve import G1, g1_generator
from scroll_prover_tpu.fields.limbs import FQ_LIMB, FR_LIMB, ints_to_limbs, limbs_to_ints
from scroll_prover_tpu.ops import field_ops as fo
from scroll_prover_tpu.ops import fixed_base as fb


def _check(flat_ints, s_ints, g):
    for i, s in enumerate(s_ints):
        want = G1.mul(g, s) if s else None
        x, y = flat_ints[2 * i], flat_ints[2 * i + 1]
        got = None if x == y == 0 else (x, y)
        assert got == want, i


def test_scan_path_matches_host(rng):
    g = g1_generator()
    s_ints = [int(v) for v in rng.integers(0, 2**61, 32)]
    s_ints[0] = 0
    s_ints[1] = FR_LIMB.modulus - 1
    out = fb.fixed_base_mul_dev(g, jnp.asarray(ints_to_limbs(s_ints)))
    flat = limbs_to_ints(np.asarray(fo.from_mont(FQ_LIMB, out.reshape(64, -1))))
    _check(flat, s_ints, g)


@pytest.mark.slow
def test_tile_kernel_matches_host_interpret(rng):
    g = g1_generator()
    n = 1024
    s_ints = [int(v) for v in rng.integers(0, 2**61, n)]
    s_ints[0] = 0
    s = jnp.asarray(ints_to_limbs(s_ints))
    acc = fb._accumulate_tile(fb._table_for(g), fb._digits(s), interpret=True)
    out = np.asarray(fb._normalize(acc))
    flat = limbs_to_ints(
        np.asarray(fo.from_mont(FQ_LIMB, jnp.asarray(out.reshape(2 * n, -1))))
    )
    _check(flat, s_ints, g)

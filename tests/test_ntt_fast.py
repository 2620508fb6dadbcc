"""Pallas limb-major staged NTT vs the reference scan NTT (interpret mode)."""
import jax.numpy as jnp
import numpy as np
import pytest

from scroll_prover_tpu.fields.limbs import FR_LIMB
from scroll_prover_tpu.ops import field_ops as fo
from scroll_prover_tpu.ops.ntt import EvaluationDomain
from scroll_prover_tpu.ops.ntt_fast import FastDomain, butterfly_t


@pytest.mark.parametrize("k", [6])
def test_fast_matches_reference(rng, k):
    dom = EvaluationDomain(k)
    fast = FastDomain(k, interpret=True)
    x = fo.to_mont(FR_LIMB, jnp.asarray(fo.rand_elements(FR_LIMB, rng, 1 << k)))
    want = np.asarray(dom.ntt(x))
    got = np.asarray(fast.ntt(x))
    np.testing.assert_array_equal(got, want)


def test_butterfly_kernel(rng):
    m = 8
    u = fo.to_mont(FR_LIMB, jnp.asarray(fo.rand_elements(FR_LIMB, rng, m)))
    w = fo.to_mont(FR_LIMB, jnp.asarray(fo.rand_elements(FR_LIMB, rng, m)))
    t = fo.to_mont(FR_LIMB, jnp.asarray(fo.rand_elements(FR_LIMB, rng, m)))
    s_, d = butterfly_t(u.T, w.T, t.T, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(s_.T), np.asarray(fo.add_mod(FR_LIMB, u, w))
    )
    want_d = fo.mont_mul(FR_LIMB, fo.sub_mod(FR_LIMB, u, w), t)
    np.testing.assert_array_equal(np.asarray(d.T), np.asarray(want_d))

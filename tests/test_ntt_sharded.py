"""Four-step sharded NTT vs the single-chip NTT (8-device CPU mesh)."""
import jax.numpy as jnp
import numpy as np

from scroll_prover_tpu.fields.limbs import FR_LIMB
from scroll_prover_tpu.ops import field_ops as fo
from scroll_prover_tpu.ops.ntt import EvaluationDomain
from scroll_prover_tpu.parallel.mesh import make_mesh
from scroll_prover_tpu.parallel.ntt_sharded import ShardedDomain


def test_sharded_matches_single_chip(rng):
    k = 9
    dom = EvaluationDomain(k)
    mesh = make_mesh(8)
    sdom = ShardedDomain(dom, mesh)
    x = jnp.asarray(fo.rand_elements(FR_LIMB, rng, 1 << k))
    xm = fo.to_mont(FR_LIMB, x)
    want = np.asarray(dom.ntt(xm))
    got = np.asarray(sdom.ntt_flat(xm))
    np.testing.assert_array_equal(got, want)


def test_sharded_uneven_split(rng):
    k = 8
    dom = EvaluationDomain(k)
    mesh = make_mesh(4)
    sdom = ShardedDomain(dom, mesh, k1=5)
    x = jnp.asarray(fo.rand_elements(FR_LIMB, rng, 1 << k))
    xm = fo.to_mont(FR_LIMB, x)
    want = np.asarray(dom.ntt(xm))
    got = np.asarray(sdom.ntt_flat(xm))
    np.testing.assert_array_equal(got, want)

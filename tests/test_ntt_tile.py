"""Tiled four-step NTT engine (ops/ntt_tile.py) vs the scan engine.

Interpret-mode Pallas on the CPU test mesh; the real-TPU timing runs live in
bench.py. Capability anchor: halo2 best_fft at the reference's inner degree
(SURVEY.md section 3.1 hot path).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from scroll_prover_tpu.fields.limbs import FR_LIMB as F, ints_to_limbs
from scroll_prover_tpu.ops.ntt import EvaluationDomain
from scroll_prover_tpu.ops.ntt_tile import TiledDomain

K = 10  # covers one recursion level (KMAX=8) + base kernel


@pytest.fixture(scope="module")
def data(rng_mod):
    n = 1 << K
    vals = [int(x) for x in rng_mod.integers(0, 2**63, n)]
    return jnp.asarray(ints_to_limbs([v * (1 << 256) % F.modulus for v in vals]))


@pytest.fixture(scope="module")
def rng_mod():
    return np.random.default_rng(0x7117E)


def test_tiled_matches_scan_ntt(data):
    td = TiledDomain(K, interpret=True)
    dom = EvaluationDomain(K)
    got = np.asarray(td.ntt(data))
    want = np.asarray(dom.ntt(data))
    np.testing.assert_array_equal(got, want)


def test_tiled_roundtrip(data):
    td = TiledDomain(K, interpret=True)
    back = np.asarray(td.intt(td.ntt(data)))
    np.testing.assert_array_equal(back, np.asarray(data))


def test_tiled_intt_matches_scan(data):
    td = TiledDomain(K, interpret=True)
    dom = EvaluationDomain(K)
    got = np.asarray(td.intt(data))
    want = np.asarray(dom.intt(data))
    np.testing.assert_array_equal(got, want)


def test_dispatch_stays_on_scan_for_cpu():
    # On the CPU test backend EvaluationDomain must not pick the tiled
    # engine (pallas TPU kernels don't run on the CPU backend).
    dom = EvaluationDomain(4)
    assert dom._tiled(False) is False


def test_tiled_batch_matches_per_column(data):
    td = TiledDomain(K, interpret=True)
    cols = jnp.stack([data, jnp.roll(data, 7, axis=0), data[::-1], data])
    got = np.asarray(td.ntt_batch(cols))
    for c in range(cols.shape[0]):
        np.testing.assert_array_equal(got[c], np.asarray(td.ntt(cols[c])))
    back = np.asarray(td.intt_batch(jnp.asarray(got)))
    np.testing.assert_array_equal(back, np.asarray(cols))

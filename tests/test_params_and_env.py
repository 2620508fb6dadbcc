"""Params downsizing invariants + env utils (reference unit/params tiers:
integration/tests/integration.rs:5-23, unit_tests.rs:13-20)."""
import os
import re

from scroll_prover_tpu.proof_system import kzg
from scroll_prover_tpu.prover import load_params, load_params_map
from scroll_prover_tpu.utils import read_env_var, short_git_version


def test_downsize_preserves_g2_and_truncates(tmp_path):
    srs = kzg.SRS.generate(6)
    small = srs.downsize(4)
    # the invariants integration.rs asserts: shared g2/s_g2, halved n,
    # monomial powers are a prefix
    assert small.g2 == srs.g2 and small.s_g2 == srs.s_g2
    assert small.n == 16
    assert small.g1_powers == srs.g1_powers[:16]
    # lagrange basis re-derived for the smaller domain commits consistently:
    # sum of lagrange points == sum of monomial basis evaluated at 1s
    # (both equal commit to the all-ones poly)
    from scroll_prover_tpu.curves.bn254_curve import G1

    acc_l = None
    for pt in small.g1_lagrange:
        acc_l = G1.add(acc_l, pt)
    acc_m = None
    # sum_i L_i(tau) == 1 at X=... sum of all lagrange = 1 poly -> G * 1
    assert acc_l == small.g1_powers[0]


def test_downsize_group_intt_exact():
    """The device group-iNTT Lagrange rebuild (ops/group_ntt.py) is
    bit-exact vs directly generating the smaller SRS (same tau)."""
    big = kzg.SRS.generate(7)
    small = big.downsize(5)
    ref = kzg.SRS.generate(5)
    assert small.g1_lagrange == ref.g1_lagrange


def test_load_params_roundtrip(tmp_path):
    p1 = load_params(str(tmp_path), 5)
    assert os.path.exists(tmp_path / "params5")
    p2 = load_params(str(tmp_path), 5)  # now from disk
    assert p2.g1_powers == p1.g1_powers and p2.s_g2 == p1.s_g2
    m = load_params_map(str(tmp_path), [4, 5])
    assert set(m) == {4, 5}


def test_short_git_version():
    v = short_git_version()
    assert re.fullmatch(r"[0-9a-f]{7,}", v)


def test_read_env_var(monkeypatch):
    monkeypatch.setenv("SPT_X_INT", "7")
    monkeypatch.setenv("SPT_X_BOOL", "true")
    assert read_env_var("SPT_X_INT", 0) == 7
    assert read_env_var("SPT_X_BOOL", False) is True
    assert read_env_var("SPT_MISSING", "d") == "d"

"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's test strategy of cheap tiers first (SURVEY.md section
4): unit tests on CPU here; real-TPU runs happen via bench.py / the driver.
"""
import os

# Must be set before jax initializes a backend.
os.environ["JAX_PLATFORMS"] = "cpu"
# shrink the in-circuit blob domain for CPU test tiers (production: 4096)
os.environ.setdefault("SPT_BLOB_WIDTH", "64")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers a remote "axon" TPU backend
# and overrides the platform selection; pin it back to CPU for unit tests
# (the driver benches on the real chip separately).
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the limb-plane graphs are compile-heavy, and
# repeat test runs should not pay XLA again.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0x5C2011)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: long-running tier (real-size MSM/ladder runs)"
    )


def pytest_collection_modifyitems(config, items):
    """Default tier skips slow-marked tests (the documented SPT_SLOW=1 /
    `make test-slow` contract; mirrors the reference's tiering where real
    proving never runs in CI — SURVEY.md section 4). They still run when
    explicitly selected via -m or when SPT_SLOW=1."""
    if os.environ.get("SPT_SLOW") == "1" or "slow" in (config.option.markexpr or ""):
        return
    skip = pytest.mark.skip(reason="slow tier: set SPT_SLOW=1 or -m slow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

"""Test env: force the CPU backend with 8 virtual devices BEFORE jax import.

This is the rebuild's analog of the reference's device-free execution path
(``benchmark_ivf.py`` running index artifacts on ONNX Runtime CPU EP,
SURVEY §4.7) — but it also covers the multi-chip sharded paths, which the
reference could not test without hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def small_data():
    """Tiny SIFT-like corpus shared across tests."""
    from rag_on_edge_tpu.utils.datasets import make_synthetic

    base, queries = make_synthetic(n_base=2048, n_queries=32, dim=128, n_clusters=16, seed=7)
    return base, queries

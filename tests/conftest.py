"""Test env: force the CPU backend with 8 virtual devices BEFORE jax import.

This is the rebuild's analog of the reference's device-free execution path
(``benchmark_ivf.py`` running index artifacts on ONNX Runtime CPU EP,
SURVEY §4.7) — but it also covers the multi-chip sharded paths, which the
reference could not test without hardware.
"""

import os

# The image exports JAX_PLATFORMS=axon (the real TPU) and its
# sitecustomize imports jax before pytest loads this conftest, so env vars
# are already baked — override through jax.config instead.
# NOTE: the env var alone does NOT protect subprocesses — sitecustomize
# re-registers the axon platform at every interpreter start, clobbering
# it.  Subprocess-spawning tests must pin jax.config.update("jax_platforms",
# "cpu") inside the child (see tests/test_graft_entry.py).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

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

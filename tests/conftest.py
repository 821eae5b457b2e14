"""Test env: force a virtual 8-device CPU platform before JAX loads.

Mirrors SURVEY.md §4: multi-chip sharding logic is exercised on a host-side
mesh (the TPU analog of a fake backend); numerics tests run on CPU where
float64 is available for tight golden comparisons.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Force CPU even when the session platform is the real TPU (axon): numerics
# tests want f64-capable CPU and the virtual 8-device mesh. The axon plugin
# ignores the JAX_PLATFORMS env var, so set the config flag directly too.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)

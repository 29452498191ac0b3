"""Test configuration: force an 8-device CPU mesh so multi-chip sharding
paths are exercised without TPU hardware (same mesh code runs on TPU)."""
import os

# Force-override: the ambient environment pins JAX_PLATFORMS to the TPU
# plugin; tests must run hermetically on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Exact f32 matmuls for parity tests (TPU default would use bf16 passes).
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

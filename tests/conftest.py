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

# The TPU-tunnel plugin re-asserts jax_platforms='axon,cpu' from
# sitecustomize, overriding the env var — force CPU at the config level.
jax.config.update("jax_platforms", "cpu")

# Exact f32 matmuls for parity tests (TPU default would use bf16 passes).
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.default_backend() == "cpu", jax.devices()
assert len(jax.devices()) == 8, jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)

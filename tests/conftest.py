"""Test configuration: CPU backend, 8 virtual devices, float64 enabled.

Must set env vars before jax initializes (SURVEY §4.8: fake an 8-device mesh
via --xla_force_host_platform_device_count for multi-chip tests without
hardware).
"""
import os

# Overwrite (not setdefault): the harness pre-sets JAX_PLATFORMS=axon (real
# TPU via tunnel; sitecustomize registers it at interpreter start) and
# compiling every tiny test op there takes 10-40 s.  jax.config.update
# before first backend use redirects to CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)

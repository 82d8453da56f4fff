"""Test configuration: run everything on a virtual 8-device CPU mesh.

The driver benches on real TPU; tests exercise the same jitted code paths on
CPU with XLA's host-platform device-count override so multi-chip sharding is
validated without TPU hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override any axon/tpu setting from the env
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)

"""Test configuration: force an 8-device virtual CPU mesh before JAX imports.

Multi-device sharding tests run on the virtual devices; numerics tests are
platform-agnostic. (Real-TPU benchmarking happens via bench.py, not pytest.)
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.key(0)

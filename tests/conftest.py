"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding tests run against a fake 8-device host-platform mesh —
the standard JAX mechanism for validating pjit/sharding without TPU hardware
(SURVEY.md §4).  Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)

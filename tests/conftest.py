"""Test configuration: force CPU JAX with 8 virtual devices.

Multi-chip sharding tests run against a fake 8-device host-platform mesh —
the standard JAX mechanism for validating pjit/sharding without TPU hardware
(SURVEY.md §4).  Must run before jax is imported anywhere.
"""

import os

# The axon TPU plugin registers itself from sitecustomize whenever
# PALLAS_AXON_POOL_IPS is set; blank it so tests run on the CPU platform with
# virtual devices (and don't monopolize the real chip).
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

# Tests that enable the persistent compile cache (bench smoke, profiling
# tools) must NOT share /root/.jax_cache with concurrent TPU runs: two
# processes writing one cache entry can abort mid-write (zstandard), and a
# later run SEGFAULTS reading the corrupt entry (both observed in round 4).
# Give every test session its own throwaway cache.
import atexit  # noqa: E402
import shutil  # noqa: E402
import tempfile  # noqa: E402

_cache_dir = tempfile.mkdtemp(prefix="jax_cache_test_")
os.environ["JAX_COMPILATION_CACHE_DIR"] = _cache_dir
atexit.register(shutil.rmtree, _cache_dir, ignore_errors=True)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize may already have imported jax and pinned
# jax_platforms='axon,cpu' via jax.config — override it back to cpu.
try:
    jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)

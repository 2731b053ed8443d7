"""Test configuration: force an 8-fake-device CPU backend.

This is the fake-cluster substitute for a real TPU mesh (SURVEY.md section 4):
multi-device sharding tests run on 8 virtual CPU devices. The axon
sitecustomize pins jax_platforms to the TPU tunnel, so we override via
jax.config (env vars alone are not enough here).
"""

import os
import sys

os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=8 "
                           + os.environ.get("XLA_FLAGS", ""))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# repo root importable regardless of invocation directory
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_devices():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 fake CPU devices (XLA_FLAGS not applied)")
    return devs[:8]

# persistent compilation cache: repeat test runs skip recompiles
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/ddti_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
except Exception:
    pass

"""Test harness configuration.

Forces JAX onto the host CPU backend with 8 virtual devices so
multi-chip sharding logic (data + template mesh axes) is exercised
without TPU hardware.  Must run before anything imports jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize registers the tunnelled-TPU PJRT plugin at
# interpreter startup and overrides jax_platforms, so the env var alone
# is NOT enough — force the config back to CPU before any backend use.
jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", "tests must not run on the tunnelled TPU"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from nope_tpu.utils.env import enable_compilation_cache  # noqa: E402

# first-compiles cost seconds per op-shape on this host; persist them
enable_compilation_cache()


@pytest.fixture
def rng():
    return np.random.default_rng(0)

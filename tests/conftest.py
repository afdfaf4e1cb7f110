"""Test config: run JAX on a virtual 8-device CPU mesh (no TPU required).

Must set env vars before jax is imported anywhere in the test process.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# JAX_PLATFORMS env var is overridden by the axon TPU plugin in this image;
# the programmatic config is honored.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

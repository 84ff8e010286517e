"""Test configuration: run everything on a simulated 8-device CPU mesh.

Must set platform flags before jax initializes.  Pallas kernels run in
interpreter mode on CPU (exercised explicitly via ``interpret=True``).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# a PJRT plugin may have been force-registered at interpreter start; make
# sure tests still run on the simulated multi-device CPU backend
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)

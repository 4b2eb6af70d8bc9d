"""Test env: force an 8-device virtual CPU platform before jax initializes.

Multi-device tests exercise the mesh/sharding paths without TPU hardware, per
the build contract (SURVEY.md section 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The sandbox's sitecustomize registers an experimental remote-TPU ("axon")
# backend and force-selects it; tests must run on the 8-device virtual CPU
# platform, so explicitly re-select cpu before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(0)

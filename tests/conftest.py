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
import json

import pytest

_DURATIONS = None


def pytest_collection_modifyitems(config, items):
    """Tiered suite: tests whose measured wall time exceeds
    PARTNER_SLOW_THRESHOLD (default 5 s) are auto-marked ``slow`` from the
    checked-in manifest, so ``pytest -m "not slow"`` is a <5-min smoke
    tier on this 1-core host. Regenerate the manifest once per round:
      pytest tests/ -q --durations=0 > log && python tools/update_durations.py log
    Unmeasured (new) tests default to the fast tier until re-measured."""
    global _DURATIONS
    if _DURATIONS is None:
        path = os.path.join(os.path.dirname(__file__), "durations.json")
        _DURATIONS = {}
        if os.path.exists(path):
            with open(path) as f:
                for k, v in json.load(f).items():
                    _DURATIONS[k.split("tests/", 1)[-1]] = v
    thr = float(os.environ.get("PARTNER_SLOW_THRESHOLD", "5"))
    for item in items:
        nodeid = item.nodeid.split("tests/", 1)[-1]
        if _DURATIONS.get(nodeid, 0.0) > thr:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.RandomState(0)

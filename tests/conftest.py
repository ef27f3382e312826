"""Test configuration: force an 8-device virtual CPU mesh before JAX initializes.

Mirrors the reference's absent test story with the strategy from SURVEY.md §4: every trainer
and sharding path must run on a simulated multi-device CPU platform so multi-chip code is
exercised without TPU hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)

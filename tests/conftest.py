"""Test configuration: force an 8-device virtual CPU mesh before any backend initializes.

Mirrors the reference's absent test story with the strategy from SURVEY.md §4: every trainer
and sharding path must run on a simulated multi-device CPU platform so multi-chip code is
exercised without TPU hardware.

NOTE: the environment pre-imports jax (sitecustomize registers the axon TPU plugin and sets
``JAX_PLATFORMS=axon``), so env vars alone are too late — ``jax.config.update`` is the
reliable switch as long as no backend has been touched yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-compile tests (full-res 3D models, e2e)")
    # Persistent XLA compilation cache: repeated test runs skip the slow CPU compiles.
    cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture()
def rng():
    # Function-scoped: a shared mutable generator would make each test's data depend
    # on which tests ran before it — failures would not reproduce in isolation.
    return np.random.default_rng(0)

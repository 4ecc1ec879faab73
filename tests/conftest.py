"""Test configuration: force JAX onto CPU with 8 virtual devices so
multi-chip sharding paths are exercised without TPU hardware
(SURVEY.md §4 recommended strategy)."""

import os

# Must run before jax initializes any backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The axon TPU plugin (sitecustomize) overrides jax_platforms at interpreter
# start; force it back to CPU before any backend is initialized.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite compiles hundreds of tiny
# near-identical graphs; caching them across runs cuts the quick tier by
# minutes (VERDICT r2 #8).  Keyed by XLA version + flags + topology, so the
# 8-virtual-device layout above is part of the key.  SPEV_TEST_CACHE=0
# disables (e.g. when bisecting compiler-level behavior).
if os.environ.get("SPEV_TEST_CACHE", "1") != "0":
    _cache_dir = os.path.expanduser("~/.cache/spev_tpu/xla_tests_cpu")
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _reset_matmul_precision():
    """set_matmul_precision is module-global session state; tests that build
    steps at 'mixed'/'default' must not leak that into later tests."""
    yield
    from spev_tpu.models import modules

    modules.set_matmul_precision("high")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def repo_root():
    import pathlib

    return pathlib.Path(__file__).resolve().parent.parent

"""Test bootstrap: force JAX onto CPU with 8 virtual devices.

This runs before any test module imports jax, so every test sees an 8-device
mesh — letting multi-chip sharding logic (pjit/shard_map over a Mesh) be
exercised without TPU hardware. The reference has no analogue (its DDP path is
untested in CI, SURVEY.md §4); this is a deliberate improvement.
"""

import os

# Overwrite (not setdefault): the environment may pin JAX_PLATFORMS to the
# real TPU tunnel, which tests must never touch.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# The environment's sitecustomize may have programmatically registered a TPU
# backend and set jax_platforms="axon,cpu"; pin it back to CPU for tests.
jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite is dominated by XLA:CPU compile
# time; re-runs (and reruns of single tests while debugging) skip it. Cold
# first runs are unaffected. Override with TPU_TTS_TEST_CACHE=0.
if os.environ.get("TPU_TTS_TEST_CACHE", "1") != "0":
    _cache = os.environ.get("TPU_TTS_TEST_CACHE_DIR", "/tmp/jax_cache_tests")
    os.makedirs(_cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def get_tests_data_path() -> str:
    return os.path.join(os.path.dirname(__file__), "data")


def get_tests_output_path() -> str:
    path = os.path.join(os.path.dirname(__file__), "outputs")
    os.makedirs(path, exist_ok=True)
    return path

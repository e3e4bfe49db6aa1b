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

"""Test configuration: force the JAX CPU backend with 8 virtual devices so
multi-chip sharding tests (shard_map over a Mesh) run anywhere, per
SURVEY.md §4. Must run before jax is imported by any test module."""

import os

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel) via a site
# hook, so the env var alone is not enough — set the config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)

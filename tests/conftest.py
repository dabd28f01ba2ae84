"""Test configuration: run the suite on a virtual 8-device CPU mesh.

The single physical TPU chip in this environment is attached through a remote
tunnel; eager per-op dispatch is slow and multi-chip hardware is unavailable.
Tests therefore force the CPU backend with 8 virtual devices so sharding /
collectives are exercised for real (SURVEY.md §7 step 7).

NOTE: the JAX_PLATFORMS environment variable alone is overridden by the
platform plugin here; ``jax.config.update('jax_platforms', ...)`` is
authoritative, so we set both before any test imports jax modules.
"""
import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs

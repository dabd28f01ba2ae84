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

# The suite is XLA-COMPILE-bound (tiny data, many distinct programs), so the
# test config trades codegen quality for compile time:
#   * backend optimization level 0 — ~20% faster compiles, measured; tests
#     assert correctness, not throughput (bench.py keeps full optimization);
#   * a persistent compile cache shared across xdist workers, subprocess
#     tests (env var form is inherited) and repeated runs.
_flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in _flags:
    _flags += " --xla_force_host_platform_device_count=8"
if "--xla_backend_optimization_level" not in _flags:
    _flags += " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = _flags.strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.expanduser("~"), ".cache", "gym_flock_tpu", "jax_cache"
    ),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
# Occupancy envs auto-discover the reference's real ARL facility map
# (envs/maps.py) — a 5,759-node ExploreFull world.  The suite defaults to
# the procedural worlds for speed and world-size stability; the dedicated
# real-map tests (test_real_map.py) re-enable discovery explicitly.
os.environ.setdefault("GYM_FLOCK_TPU_MAPS", "off")

import jax

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def devices8():
    devs = jax.devices()
    assert len(devs) >= 8, f"expected 8 virtual CPU devices, got {devs}"
    return devs


def pytest_addoption(parser):
    parser.addoption(
        "--runslow",
        action="store_true",
        default=False,
        help="run tests marked slow (full-depth tier)",
    )


def pytest_collection_modifyitems(config, items):
    """Tier the suite: the default run stays under ~5 minutes (every
    component exercised at least once); full-depth variants are marked
    ``slow`` and run with --runslow / GFT_SLOW=1 / -m slow."""
    run_slow = (
        config.getoption("--runslow")
        or os.environ.get("GFT_SLOW", "") not in ("", "0")
        or "slow" in (config.getoption("-m") or "")
    )
    if run_slow:
        return
    skip = pytest.mark.skip(
        reason="slow tier: pass --runslow (or GFT_SLOW=1) to run"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)

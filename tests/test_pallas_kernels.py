"""Pallas kernels vs XLA reference kernels (interpreter mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gym_flock_tpu.envs.flocking import (
    FlockingParams,
    flocking_features,
    turner_controller,
    mean_pool_normalize,
)
from gym_flock_tpu.ops.pallas_flocking import (
    adjacency_matmul,
    flocking_sums,
    khop_aggregate,
    turner_controller_large,
)


@pytest.mark.parametrize("n", [64, 137, 200])
def test_flocking_sums_matches_xla(n):
    x = jnp.asarray(np.random.RandomState(0).randn(n, 4).astype(np.float32) * 2)
    params = FlockingParams(n_agents=n)
    s = flocking_sums(x, params.comm_radius, params.comm_radius2, interpret=True)
    values, adj, _, _ = flocking_features(x, params.comm_radius2)
    scale = 1.0 + jnp.abs(values)
    assert float(jnp.max(jnp.abs(s[:, :6] - values) / scale)) < 1e-4
    np.testing.assert_allclose(np.asarray(s[:, 8]), np.asarray(jnp.sum(adj, axis=1)))


def test_pallas_controller_matches_xla():
    n = 150
    x = jnp.asarray(np.random.RandomState(1).randn(n, 4).astype(np.float32) * 2)
    params = FlockingParams(n_agents=n)
    u_ref = turner_controller(x, params)
    u_pal = turner_controller_large(
        x, params.comm_radius, params.comm_radius2, params.action_scalar, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u_pal), np.asarray(u_ref), atol=1e-4)


@pytest.mark.parametrize("mean_pool", [True, False])
def test_adjacency_matmul_matches_xla(mean_pool):
    n, f = 200, 16
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(n, 4).astype(np.float32) * 2)
    h = jnp.asarray(rng.randn(n, f).astype(np.float32))
    cr2 = 0.81
    out = adjacency_matmul(x, h, cr2, mean_pool=mean_pool, interpret=True)

    dx = x[:, 0][:, None] - x[:, 0][None, :]
    dy = x[:, 1][:, None] - x[:, 1][None, :]
    r2 = dx * dx + dy * dy
    adj = ((r2 < cr2) & ~jnp.eye(n, dtype=bool)).astype(jnp.float32)
    want = adj @ h
    if mean_pool:
        want = mean_pool_normalize(adj) @ h
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=2e-4)


def test_khop_aggregate_shapes():
    n, f = 100, 6
    x = jnp.asarray(np.random.RandomState(3).randn(n, 4).astype(np.float32))
    feats = jnp.asarray(np.random.RandomState(4).randn(n, f).astype(np.float32))
    z = khop_aggregate(x, feats, 0.81, k_hops=3, interpret=True)
    assert z.shape == (n, 3 * f)


def test_large_flocking_env_matches_reference_env_semantics():
    """LargeFlockingEnv's features/expert equal the dense-path env."""
    import gym_flock_tpu as gft

    env_l, params = gft.make("FlockingLarge-v0", n_agents=96)
    env_d, _ = gft.make("FlockingRelative-v0")
    x = jnp.asarray(np.random.RandomState(0).randn(96, 4).astype(np.float32) * 2)
    sl = env_l.init_state(x, params)

    # interpret=True path for CPU testing
    from gym_flock_tpu.ops.pallas_flocking import flocking_features_large, turner_controller_large

    vals, deg = flocking_features_large(x, params.comm_radius, params.comm_radius2, interpret=True)
    want_vals, adj, _, _ = flocking_features(x, params.comm_radius2)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(want_vals), atol=2e-4)
    u = turner_controller_large(x, params.comm_radius, params.comm_radius2,
                                params.action_scalar, interpret=True)
    want_u = turner_controller(x, params)
    np.testing.assert_allclose(np.asarray(u), np.asarray(want_u), atol=1e-4)


def test_flocking_sums_batched_equals_per_env():
    from gym_flock_tpu.ops.pallas_flocking import flocking_sums, flocking_sums_batched

    rng = np.random.RandomState(7)
    xs = jnp.asarray(rng.randn(3, 80, 4).astype(np.float32) * 2)
    out_b = flocking_sums_batched(xs, 0.9, 0.81, interpret=True)
    for i in range(3):
        want = np.asarray(flocking_sums(xs[i], 0.9, 0.81, interpret=True))
        got = np.asarray(out_b[i])
        # different reduction tiling -> f32 accumulation-order noise on the
        # large 1/r^4 channels; compare relative to channel magnitude
        err = np.abs(got - want) / (1.0 + np.abs(want))
        assert err.max() < 1e-4, f"env {i}: max rel err {err.max()}"


def test_flocking_sums_vmap_routes_to_native_batch():
    """jax.vmap of the compiled kernel path must agree with per-env calls."""
    jax.config.update("jax_platforms", "cpu")
    from gym_flock_tpu.ops.pallas_flocking import flocking_sums

    rng = np.random.RandomState(9)
    xs = jnp.asarray(rng.randn(4, 64, 4).astype(np.float32) * 2)
    # interpret path for reference
    want = jnp.stack([flocking_sums(xs[i], 0.9, 0.81, interpret=True) for i in range(4)])
    # compiled custom_vmap path (CPU-compiled pallas via interpret=False works
    # on CPU through the Pallas interpreter lowering? if not, skip)
    try:
        got = jax.vmap(lambda x: flocking_sums(x, 0.9, 0.81))(xs)
    except Exception:
        import pytest
        pytest.skip("compiled pallas unavailable on CPU")
    err = np.abs(np.asarray(got) - np.asarray(want)) / (1.0 + np.abs(np.asarray(want)))
    assert err.max() < 1e-4


@pytest.mark.parametrize("n", [300, 260, 383])
def test_flocking_sums_row_coverage_regression(n):
    """257 <= N <= 384 once under-tiled the row grid, leaving NaN rows."""
    x = jnp.asarray(np.random.RandomState(0).randn(n, 4).astype(np.float32) * 2)
    s = flocking_sums(x, 0.9, 0.81, interpret=True)
    assert bool(jnp.isfinite(s).all()), "uninitialized output rows"
    values, adj, _, _ = flocking_features(x, 0.81)
    scale = 1.0 + jnp.abs(values)
    assert float(jnp.max(jnp.abs(s[:, :6] - values) / scale)) < 1e-4


def test_adjacency_matmul_row_coverage_regression():
    n, f = 300, 16
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(n, 4).astype(np.float32) * 2)
    h = jnp.asarray(rng.randn(n, f).astype(np.float32))
    out = adjacency_matmul(x, h, 0.81, interpret=True)
    assert bool(jnp.isfinite(out).all())

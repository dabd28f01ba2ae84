"""Legacy-RNG parity reset: bit-identical initial states from a seed."""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import gym_flock_tpu as gft
from gym_flock_tpu.compat.parity import reference_flocking_reset

from tests.reference_oracle import reference_available, make_reference_env

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)


@pytest.mark.parametrize("seed", [0, 7])
def test_reset_bit_identical_from_seed(seed):
    n = 40
    ref = make_reference_env("FlockingRelative-v0")
    ref.n_agents = n
    ref.r_max = ref.r_max * np.sqrt(n)  # params_from_cfg scaling (ref :75)

    np.random.seed(seed)
    ref.reset()

    np.random.seed(seed)
    x0 = reference_flocking_reset(
        n_agents=n, r_max=ref.r_max, v_max=ref.v_max,
        comm_radius2=ref.comm_radius2,
    )
    np.testing.assert_array_equal(x0, ref.x)  # bit-identical


def test_full_golden_trajectory_from_seed():
    """Seed -> reset -> expert rollout: whole trajectory matches at 1e-9."""
    n = 30
    ref = make_reference_env("FlockingRelative-v0")
    ref.n_agents = n
    ref.r_max = ref.r_max * np.sqrt(n)

    np.random.seed(3)
    ref.reset()

    np.random.seed(3)
    x0 = reference_flocking_reset(n, ref.r_max, ref.v_max, ref.comm_radius2)

    env, params = gft.make("FlockingRelative-v0", n_agents=n)
    state = env.init_state(jnp.asarray(x0), params)
    for t in range(30):
        ref_u = ref.controller()
        u = env.expert(state, params)
        ref.step(ref_u)
        state, _, _, _, _ = env.step_env(jax.random.key(0), state, u, params)
        np.testing.assert_allclose(np.asarray(state.x), ref.x, atol=1e-9, err_msg=f"t={t}")


def test_potential_matches_reference():
    n = 25
    ref = make_reference_env("FlockingRelative-v0")
    ref.n_agents = n
    rng = np.random.RandomState(5)
    x0 = np.zeros((n, 4))
    x0[:, 0:2] = rng.uniform(-2, 2, size=(n, 2))
    ref.x = x0
    ref.compute_helpers()
    want = ref.potential(ref.r2)

    env, params = gft.make("FlockingRelative-v0", n_agents=n)
    state = env.init_state(jnp.asarray(x0), params)
    got = float(env.potential(state, params))
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_shepherding_reset_bit_identical_from_seed():
    from gym_flock_tpu.compat.parity import reference_shepherding_reset

    ref = make_reference_env("Shepherding-v0")
    ref.seed(13)
    ref.reset()
    x0 = reference_shepherding_reset(13)
    np.testing.assert_array_equal(x0, ref.x)

    # full golden trajectory: expert drives both from the seed alone
    import gym_flock_tpu as gft
    env, params = gft.make("Shepherding-v0")
    state = env.init_state(jnp.asarray(x0.copy()), params)
    for t in range(20):
        ref_u = ref.controller()
        u = env.expert(state, params)
        np.testing.assert_allclose(np.asarray(u), ref_u, atol=1e-9)
        ref.step(ref_u)
        state, _, _, _, _ = env.step_env(jax.random.key(0), state, u, params)
        np.testing.assert_allclose(np.asarray(state.x), ref.x, atol=1e-9, err_msg=f"t={t}")


def test_load_cfg_section():
    import tempfile, os
    from gym_flock_tpu.compat.gym_api import load_cfg_section
    import gym_flock_tpu as gft
    from gym_flock_tpu.compat import make_legacy

    with tempfile.NamedTemporaryFile("w", suffix=".cfg", delete=False) as f:
        f.write("[flock]\nn_agents = 24\ncomm_radius = 1.2\nv_max = 4.0\ndt = 0.02\n")
        path = f.name
    try:
        section = load_cfg_section(path)
        env = make_legacy("FlockingRelative-v0")
        env.params_from_cfg(section)
        assert env.params.n_agents == 24
        assert env.params.comm_radius == 1.2
        obs = env.reset()
        assert obs[0].shape == (24, 6)
    finally:
        os.unlink(path)


def test_coverage_reset_seed_parity():
    """Seed-exact coverage reset: seeding the global map stream and the env
    seed identically must reproduce the reference's reset() observation
    buffers byte-for-byte via reference_coverage_reset + state injection."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tests.reference_oracle import load_reference

    load_reference()
    import gym_flock.envs.spatial.coverage as ref_mod

    from gym_flock_tpu.compat.parity import reference_coverage_reset
    from gym_flock_tpu.envs.coverage import CoverageEnv, CoverageParams, CoverageState
    from gym_flock_tpu.envs.coverage_graph import build_graph_bank, build_graph_spec

    MAP_SEED, ENV_SEED, R = 1, 42, 6  # map seed 1 -> 410 targets (fits 500)

    ref = ref_mod.CoverageEnv(init_graph=False)
    ref.seed(ENV_SEED)
    np.random.seed(MAP_SEED)
    ref_obs = ref.reset()

    np.random.seed(MAP_SEED)
    targets, robot_loc, visited = reference_coverage_reset(ENV_SEED, n_robots=R)
    assert targets.shape[0] == ref.n_targets

    spec = build_graph_spec(targets, 500 - R, R, motion_radius=5.5 * 1.2, horizon=10)
    env = CoverageEnv()
    params = CoverageParams(bank=build_graph_bank([spec]))
    visited_pad = np.ones((params.max_targets,))
    visited_pad[: targets.shape[0]] = visited
    state = CoverageState(
        time=jnp.int32(0),
        graph=jnp.int32(0),
        robot_loc=jnp.asarray(robot_loc, dtype=jnp.int32),
        visited=jnp.asarray(visited_pad),
        discovered=jnp.zeros((params.max_targets,)),
        episode_reward=jnp.float32(0),
        last_loc=jnp.full((R,), -1, dtype=jnp.int32),
    )
    obs, _, _, state = env._obs_reward(state, params)

    np.testing.assert_array_equal(
        np.asarray(obs["senders"]), ref_obs["senders"].flatten()
    )
    np.testing.assert_array_equal(
        np.asarray(obs["receivers"]), ref_obs["receivers"].flatten()
    )
    np.testing.assert_allclose(np.asarray(obs["nodes"]), ref_obs["nodes"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(obs["edges"]), ref_obs["edges"], atol=1e-5)
    np.testing.assert_allclose(np.asarray(obs["step"]), ref_obs["step"])

    # and the episode continues in lockstep
    rng = np.random.RandomState(4)
    key = jax.random.key(0)
    for t in range(5):
        action = rng.randint(0, 4, size=(R,))
        ref_obs, ref_r, ref_d, _ = ref.step(action.copy())
        state, obs, r, d, _ = env.step_env(key, state, jnp.asarray(action), params)
        assert float(r) == ref_r, f"reward t={t}"
        np.testing.assert_array_equal(
            np.asarray(obs["senders"]), ref_obs["senders"].flatten(),
            err_msg=f"senders t={t}",
        )


def test_coverage_arl_reset_seed_parity():
    """Seed-exact CoverageARL reset: occupancy map load (byte-identical to
    the reference's from_occupancy), random subwindow replay, and the
    placement stream — reproduced against the real reference env driving
    the real ARL map."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tests.reference_oracle import load_reference

    load_reference()
    from gym_flock.envs.spatial.coverage_arl import CoverageARLEnv as RefARL

    from gym_flock_tpu.compat.parity import (
        reference_coverage_arl_subgraph,
        reference_coverage_reset,
    )
    from gym_flock_tpu.envs.coverage import CoverageEnv, CoverageParams, CoverageState
    from gym_flock_tpu.envs.coverage_graph import (
        _largest_component,
        build_graph_bank,
        build_graph_spec,
        targets_from_occupancy,
    )

    MAP_SEED, ENV_SEED, R = 5, 13, 4
    MOTION_RADIUS = 0.5 * 10 * 1.2  # MAP_RES * downsample * 1.2 = 6.0

    ref = RefARL(horizon=10)  # constructor consumes RNG; seed AFTER it
    ref.seed(ENV_SEED)
    np.random.seed(MAP_SEED)
    ref_obs = ref.reset()

    all_targets = _largest_component(
        targets_from_occupancy(
            path="/root/reference/gym_flock/envs/spatial/maps/grid_slice10.npy",
            downsample_rate=10,
            perimeter_delta=2.0,
        ),
        MOTION_RADIUS,
    )
    np.random.seed(MAP_SEED)
    sub = reference_coverage_arl_subgraph(all_targets, motion_radius=MOTION_RADIUS)
    assert sub.shape[0] == ref.n_targets
    targets, robot_loc, visited = reference_coverage_reset(
        ENV_SEED, n_robots=R, targets=sub, motion_radius=MOTION_RADIUS
    )

    spec = build_graph_spec(sub, 1000 - R, R, motion_radius=MOTION_RADIUS, horizon=10)
    env = CoverageEnv()
    params = CoverageParams(bank=build_graph_bank([spec]), n_robots=R, max_nodes=1000, res=5.0)
    visited_pad = np.ones((params.max_targets,))
    visited_pad[: sub.shape[0]] = visited
    state = CoverageState(
        time=jnp.int32(0),
        graph=jnp.int32(0),
        robot_loc=jnp.asarray(robot_loc, dtype=jnp.int32),
        visited=jnp.asarray(visited_pad),
        discovered=jnp.zeros((params.max_targets,)),
        episode_reward=jnp.float32(0),
        last_loc=jnp.full((R,), -1, dtype=jnp.int32),
    )
    obs, _, _, state = env._obs_reward(state, params)

    np.testing.assert_array_equal(
        np.asarray(obs["senders"]), ref_obs["senders"].flatten()
    )
    np.testing.assert_array_equal(
        np.asarray(obs["receivers"]), ref_obs["receivers"].flatten()
    )
    np.testing.assert_allclose(np.asarray(obs["nodes"]), ref_obs["nodes"], atol=1e-6)
    np.testing.assert_allclose(np.asarray(obs["edges"]), ref_obs["edges"], atol=1e-5)


@pytest.mark.parametrize("seed", [5, 11])
def test_twoflocks_reset_bit_identical_and_golden_trajectory(seed):
    """Seed-exact TwoFlocks reset (flocking_twoflocks.py:8-26) + 30-step
    lockstep rollout under the expert at 1e-9."""
    from gym_flock_tpu.compat.parity import reference_twoflocks_reset

    n = 30
    ref = make_reference_env("FlockingTwoFlocks-v0")
    ref.n_agents = n

    np.random.seed(seed)
    ref.reset()

    np.random.seed(seed)
    x0 = reference_twoflocks_reset(n_agents=n, v_bias=ref.v_bias)
    np.testing.assert_array_equal(x0, ref.x)  # bit-identical

    env, params = gft.make("FlockingTwoFlocks-v0", n_agents=n)
    state = env.init_state(jnp.asarray(x0), params)
    for t in range(30):
        ref_u = ref.controller()
        u = env.controller(state, params)
        np.testing.assert_allclose(np.asarray(u), ref_u, atol=1e-9, err_msg=f"t={t}")
        ref.step(np.asarray(u))
        state, _, _, _, _ = env.step_env(jax.random.key(0), state, u, params)
        np.testing.assert_allclose(np.asarray(state.x), ref.x, atol=1e-9, err_msg=f"t={t}")


@pytest.mark.parametrize("seed", [4, 13])
def test_stochastic_dt_stream_golden_trajectory(seed):
    """Seed-exact FlockingStochastic rollout: the per-step dt stream
    (flocking_stoch.py:20 draws from GLOBAL np.random) is replayed
    INDEPENDENTLY — the reference env and the replay each consume their own
    copy of the seeded stream (reset draws, then one normal per step), so a
    broken dt draw in the replay diverges the trajectories."""
    from gym_flock_tpu.compat.parity import (
        reference_flocking_reset,
        reference_stochastic_dt,
    )

    n = 30
    ref = make_reference_env("FlockingStochastic-v0")
    ref.n_agents = n
    ref.r_max = ref.r_max * np.sqrt(n)  # params_from_cfg scaling (ref :75)

    np.random.seed(seed)
    ref.reset()

    rng = np.random.RandomState(seed)  # independent replay of the same stream
    x0 = reference_flocking_reset(
        n, ref.r_max, ref.v_max, ref.comm_radius2, rng=rng
    )
    np.testing.assert_array_equal(x0, ref.x)  # bit-identical reset

    env, params = gft.make("FlockingStochastic-v0", n_agents=n)
    state = env.init_state(jnp.asarray(x0), params)
    for t in range(30):
        ref_u = ref.controller()
        u = env.controller(state, params)
        np.testing.assert_allclose(np.asarray(u), ref_u, atol=1e-9, err_msg=f"t={t}")
        ref.step(np.asarray(u))
        dt = reference_stochastic_dt(rng)
        assert dt == ref.dt  # the replayed stream IS the reference's
        state, _, _, _, _ = env.step_with_dt(state, jnp.asarray(u), dt, params)
        np.testing.assert_allclose(np.asarray(state.x), ref.x, atol=1e-9, err_msg=f"t={t}")

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

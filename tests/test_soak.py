"""Long-horizon differential soaks (opt-in: GFT_SOAK=1).

Deeper than the CI parity tests: hundreds of closed-loop expert steps per
family and full coverage episodes on fresh graphs, all exact vs the
reference.  Run with `GFT_SOAK=1 python -m pytest tests/test_soak.py`.
"""
import os

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import gym_flock_tpu as gft
from tests.reference_oracle import make_reference_env, reference_available

pytestmark = pytest.mark.skipif(
    os.environ.get("GFT_SOAK") != "1", reason="set GFT_SOAK=1"
)
# only the differential soaks need the reference checkout; the distributed
# test must run (and catch regressions) everywhere
needs_reference = pytest.mark.skipif(not reference_available(), reason="no reference")


@needs_reference
def test_flocking_500_step_expert_soak():
    ref = make_reference_env("FlockingRelative-v0")
    ref.n_agents = 60
    rng = np.random.RandomState(0)
    x0 = np.zeros((60, 4))
    x0[:, :2] = rng.uniform(-2, 2, (60, 2))
    x0[:, 2:] = rng.uniform(-2, 2, (60, 2))
    ref.x = x0.copy(); ref.mean_vel = x0[:, 2:4].mean(0)
    ref.init_vel = x0[:, 2:4]; ref.compute_helpers()
    env, params = gft.make("FlockingRelative-v0", n_agents=60)
    state = env.init_state(jnp.asarray(x0), params)
    step = jax.jit(env.step_env); expert = jax.jit(env.expert)
    for t in range(500):
        u = expert(state, params)
        ref.step(np.asarray(u).copy())
        state, _, _, _, _ = step(jax.random.key(0), state, u, params)
        np.testing.assert_allclose(np.asarray(state.x), ref.x, atol=1e-12, err_msg=f"t={t}")


@needs_reference
def test_coverage_multi_graph_episode_soak():
    from gym_flock_tpu.envs.coverage import CoverageEnv, CoverageParams
    from gym_flock_tpu.envs.coverage_graph import (
        build_graph_bank, build_graph_spec, generate_coverage_targets,
    )
    from tests.test_coverage_parity import _check_obs, _ref_obs, _sync_states

    for gseed in (101, 202):
        rg = np.random.RandomState(gseed)
        while True:
            targets = generate_coverage_targets(rg)
            if 50 <= targets.shape[0] <= 494:
                break
        ref = make_reference_env("Coverage-v0").__class__(init_graph=False)
        ref._initialize_graph(targets.copy())
        spec = build_graph_spec(targets, 494, 6, motion_radius=6.6, horizon=10)
        env = CoverageEnv()
        params = CoverageParams(bank=build_graph_bank([spec]))
        for ep in range(3):
            rng = np.random.RandomState(gseed + ep)
            n_t = ref.n_targets
            locs = rng.choice(n_t, size=(6,), replace=False)
            unv = rng.choice(n_t, size=(n_t // 2,), replace=False)
            st = _sync_states(ref, params, locs, unv)
            _ref_obs(ref)
            _, _, _, st = env._obs_reward(st, params)
            for t in range(74):
                a = rng.randint(0, 4, size=(6,))
                ro, rr, rd, _ = ref.step(a.copy())
                st, o, r, d, _ = env.step_env(jax.random.key(0), st, jnp.asarray(a), params)
                assert float(r) == rr and bool(d) == rd
                _check_obs(o, ro, ref.n_agents, f"g{gseed} ep{ep} t{t}")
                if rd:
                    break


@needs_reference
def test_shepherding_300_step_expert_soak():
    ref = make_reference_env("Shepherding-v0")
    ref.seed(5); ref.reset()
    env, params = gft.make("Shepherding-v0")
    st = env.init_state(jnp.asarray(ref.x.copy()), params)
    step = jax.jit(env.step_env); expert = jax.jit(env.expert)
    for t in range(300):
        u = expert(st, params)
        ref.step(np.asarray(u).copy())
        st, _, _, _, _ = step(jax.random.key(0), st, u, params)
        np.testing.assert_allclose(np.asarray(st.x), ref.x, atol=1e-10, err_msg=f"t={t}")

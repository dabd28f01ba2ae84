"""Parity: mapping family + FlockingMulti vs the reference ``old/`` envs.

Same methodology as the other parity suites: identical states are injected
into both implementations (the reference resets use the *global* np.random
stream — SURVEY.md §5.9a — so state injection, not seed parity, is the
oracle contract) and trajectories are compared.
"""
import importlib

import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp

import gym_flock_tpu as gft
from gym_flock_tpu.envs.mapping import MappingState, _mapping_helpers
from tests.reference_oracle import load_reference, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not present"
)


def _ref_env(module: str, cls: str):
    load_reference()
    mod = importlib.import_module(f"gym_flock.envs.old.{module}")
    return getattr(mod, cls)()


def _fresh_ref_state(ref, rng):
    """Inject a random state into a reference mapping env (bypasses its
    global-np.random reset)."""
    n = ref.n_agents
    x = np.zeros((n, 4))
    x[:, 0] = rng.uniform(-ref.px_max, ref.px_max, n)
    x[:, 1] = rng.uniform(-ref.py_max, ref.py_max, n)
    if ref.nx_system == 4:
        x[:, 2] = rng.uniform(-ref.v_max, ref.v_max, n)
        x[:, 3] = rng.uniform(-ref.v_max, ref.v_max, n)
    ref.x = x[:, : ref.nx_system].copy()
    ref.target_unobserved = np.ones((ref.target_x.shape[0], 2), dtype=bool)
    return x


def _our_state(x, params):
    return MappingState(
        time=jnp.int32(0),
        x=jnp.asarray(x, dtype=jnp.float64),
        unobserved=jnp.ones((params.n_targets,), dtype=bool),
        last_obs_target=jnp.zeros((params.n_agents, params.nearest_targets * 2)),
    )


def _rollout_parity(env_id, module, cls, n_steps, action_fn, rtol=1e-9):
    """Drive both implementations from the same injected state with the same
    actions; compare obs/network/reward/done each step."""
    ref = _ref_env(module, cls)
    env, params = gft.make(env_id)
    rng = np.random.RandomState(17)
    x0 = _fresh_ref_state(ref, rng)
    state = _our_state(x0, params)

    # the reference primes helper caches via compute_helpers (its reset path)
    ref.compute_helpers()
    values, network, obs_target, newly, _ = _mapping_helpers(state.x, state.unobserved, params)
    np.testing.assert_allclose(np.asarray(values), ref.state_values, rtol=rtol, atol=1e-12)
    np.testing.assert_allclose(np.asarray(network), ref.state_network, rtol=rtol, atol=1e-12)
    state = state.replace(unobserved=state.unobserved & ~newly, last_obs_target=obs_target)

    key = jax.random.key(0)
    for t in range(n_steps):
        u = action_fn(ref, state, params, t)
        (ref_obs, ref_net), ref_r, ref_d, _ = ref.step(u.copy())
        state, (obs, net), r, d, _ = env.step_env(key, state, jnp.asarray(u), params)
        np.testing.assert_allclose(np.asarray(obs), ref_obs, rtol=rtol, atol=1e-12, err_msg=f"obs @ step {t}")
        np.testing.assert_allclose(np.asarray(net), ref_net, rtol=rtol, atol=1e-12, err_msg=f"network @ step {t}")
        np.testing.assert_allclose(np.asarray(r), ref_r, rtol=rtol, atol=1e-12, err_msg=f"reward @ step {t}")
        assert bool(d) == bool(ref_d) or bool(d)  # ours also truncates at max_steps
        np.testing.assert_array_equal(
            np.asarray(state.unobserved),
            ref.target_unobserved[:, 0],
            err_msg=f"unobserved @ step {t}",
        )


def test_mapping_base_parity():
    def act(ref, state, params, t):
        # the reference greedy expert: toward nearest unobserved target
        return np.asarray(ref.greedy_action / 10.0)

    _rollout_parity("Mapping-v0", "mapping", "MappingEnv", 4, act)


def test_mapping_base_expert_matches_reference():
    ref = _ref_env("mapping", "MappingEnv")
    env, params = gft.make("Mapping-v0")
    rng = np.random.RandomState(3)
    x0 = _fresh_ref_state(ref, rng)
    state = _our_state(x0, params)
    ref.compute_helpers()
    _, _, obs_target, newly, _ = _mapping_helpers(state.x, state.unobserved, params)
    state = state.replace(unobserved=state.unobserved & ~newly, last_obs_target=obs_target)
    ours = np.asarray(env.controller(state, params))
    theirs = np.asarray(ref.controller())
    np.testing.assert_allclose(ours, theirs, rtol=1e-9, atol=1e-12)


def test_mapping_vel_parity():
    def act(ref, state, params, t):
        rng = np.random.RandomState(100 + t)
        return rng.uniform(-1.0, 1.0, (params.n_agents, 2))

    _rollout_parity("MappingVel-v0", "mapping_vel", "MappingVelEnv", 6, act)


def test_mapping_local_parity():
    def act(ref, state, params, t):
        rng = np.random.RandomState(200 + t)
        return rng.uniform(-1.0, 1.0, (params.n_agents, 2))

    _rollout_parity("MappingLocal-v0", "mapping_local", "MappingLocalEnv", 6, act)


def test_mapping_disc_parity():
    def act(ref, state, params, t):
        rng = np.random.RandomState(300 + t)
        return rng.randint(0, params.nearest_targets, (params.n_agents, 1))

    _rollout_parity("MappingDisc-v0", "mapping_disc", "MappingDiscEnv", 6, act)


def test_mapping_done_when_all_observed():
    env, params = gft.make("MappingVel-v0", n_agents=4)
    # park every agent on top of the whole (tiny) target grid
    state = MappingState(
        time=jnp.int32(0),
        x=jnp.zeros((4, 4)),
        unobserved=jnp.ones((params.n_targets,), dtype=bool),
        last_obs_target=jnp.zeros((4, params.nearest_targets * 2)),
    )
    # huge obs radius: one step observes everything
    params = params.replace(obs_rad=1000.0)
    state, obs, r, d, _ = env.step_env(
        jax.random.key(0), state, jnp.zeros((4, 2)), params
    )
    assert bool(d)
    assert not bool(jnp.any(state.unobserved))


# ---------------------------------------------------------------------------
# FlockingMulti (delayed K-hop aggregation)
# ---------------------------------------------------------------------------


def _ref_flocking_multi(params):
    """The reference class cannot be constructed (missing old/params_flock.cfg
    — dead code upstream); instantiate bypassing __init__ and set the same
    fields its __init__ would."""
    load_reference()
    mod = importlib.import_module("gym_flock.envs.old.flocking_multi")
    ref = object.__new__(mod.FlockingMultiEnv)
    ref.filter_len = params.filter_len
    ref.nx_system = 4
    ref.n_nodes = params.n_agents
    ref.comm_radius = params.comm_radius
    ref.comm_radius2 = params.comm_radius**2
    ref.dt = params.dt
    ref.v_max = params.v_max
    ref.v_bias = ref.v_max
    ref.r_max = params.r_max
    ref.std_dev = params.std_dev
    ref.pooling = [np.nanmean]
    ref.n_pools = 1
    ref.n_features = params.n_features
    ref.nx = params.nx
    ref.nu = 2
    ref.max_accel = params.max_accel
    ref.max_z = params.max_z
    return ref


def test_flocking_multi_aggregation_and_step_parity():
    env, params = gft.make("FlockingMulti-v0", n_agents=16)
    params = params.replace(std_dev=0.0)  # zero process noise in both
    ref = _ref_flocking_multi(params)

    rng = np.random.RandomState(5)
    n = params.n_agents
    x0 = np.zeros((n, 4))
    x0[:, 0:2] = rng.uniform(-1.0, 1.0, (n, 2))
    x0[:, 2:4] = rng.uniform(-params.v_max, params.v_max, (n, 2))

    # reference reset tail (old/flocking_multi.py:170-176) with injected x
    ref.x = x0.copy()
    ref.init_vel = x0[:, 2:4].copy()
    ref.mean_vel = np.mean(x0[:, 2:4], axis=0)
    ref.x_agg = np.zeros((n, params.nx * params.filter_len, 1))
    ref.x_agg = ref.aggregate(ref.x, ref.x_agg)
    ref_obs = ref._get_obs()

    from gym_flock_tpu.envs.flocking_multi import FlockingMultiState, _aggregate

    x_agg = _aggregate(
        jnp.asarray(x0), jnp.zeros((n, params.n_features)), jnp.asarray(x0[:, 2:4]), params
    )
    state = FlockingMultiState(
        time=jnp.int32(0),
        x=jnp.asarray(x0),
        x_agg=x_agg,
        init_vel=jnp.asarray(x0[:, 2:4]),
        mean_vel=jnp.asarray(np.mean(x0[:, 2:4], axis=0)),
    )
    np.testing.assert_allclose(
        np.asarray(jnp.clip(state.x_agg, -params.max_z, params.max_z).reshape(-1)),
        ref_obs,
        rtol=1e-9,
        atol=1e-12,
    )

    key = jax.random.key(0)
    for t in range(4):
        u = np.random.RandomState(40 + t).uniform(-2.0, 2.0, (n, 2))
        ref_obs, ref_r, _, _ = ref.step(u.copy())
        state, obs, r, d, _ = env.step_env(key, state, jnp.asarray(u), params)
        np.testing.assert_allclose(np.asarray(obs), ref_obs, rtol=1e-9, atol=1e-12, err_msg=f"obs @ {t}")
        np.testing.assert_allclose(float(r), ref_r, rtol=1e-9, err_msg=f"reward @ {t}")


def test_flocking_multi_expert_parity():
    env, params = gft.make("FlockingMulti-v0", n_agents=16)
    ref = _ref_flocking_multi(params)
    rng = np.random.RandomState(9)
    x0 = rng.uniform(-1.0, 1.0, (16, 4))
    ref.x = x0.copy()
    from gym_flock_tpu.envs.flocking_multi import FlockingMultiState

    state = FlockingMultiState(
        time=jnp.int32(0),
        x=jnp.asarray(x0),
        x_agg=jnp.zeros((16, params.n_features)),
        init_vel=jnp.asarray(x0[:, 2:4]),
        mean_vel=jnp.asarray(np.mean(x0[:, 2:4], axis=0)),
    )
    np.testing.assert_allclose(
        np.asarray(env.controller(state, params)), ref.controller(), rtol=1e-9
    )


def test_mapping_envs_jit_vmap_batch():
    """The whole point of the rebuild: batched, jitted stepping."""
    env, params = gft.make("MappingVel-v0")
    B = 8
    keys = jax.random.split(jax.random.key(0), B)
    states, obs = jax.jit(jax.vmap(lambda k: env.reset_env(k, params)))(keys)
    assert obs[0].shape == (B, params.n_agents, 16)

    def step(s, k):
        u = jax.random.uniform(k, (params.n_agents, 2), minval=-1.0, maxval=1.0)
        return env.step_env(k, s, u, params)

    states2, obs2, r, d, _ = jax.jit(jax.vmap(step))(states, keys)
    assert r.shape == (B, params.n_agents)  # per-agent reward variant
    assert np.isfinite(np.asarray(r)).all()


def test_mapping_time_limit_done():
    """done fires at params.max_steps even when targets remain (the
    reference relies on gym's TimeLimit wrapper; every env family here
    applies its own limit)."""
    env, params = gft.make("Mapping-v0", n_agents=8)
    params = params.replace(max_steps=3)
    state, _ = env.reset_env(jax.random.key(0), params)
    done = False
    for t in range(3):
        assert not done, t
        u = jnp.zeros((8, 2))  # stand still: targets never all observed
        state, _, _, done, _ = env.step_env(jax.random.key(t), state, u, params)
    assert bool(done)


def test_mapping_local_arena_tracks_n_agents():
    """MappingLocal's arena half-width follows n_agents like the reference
    params_from_cfg (old/mapping_local.py:106-108)."""
    _, p20 = gft.make("MappingLocal-v0")
    _, p40 = gft.make("MappingLocal-v0", n_agents=40)
    assert p40.px_max == 40.0 and p40.py_max == 40.0
    assert p20.px_max == 20.0


def test_mapping_disc_action_space_steppable():
    """action_space.sample() must produce an action step_env accepts
    (the reference declares a bare Discrete its own step cannot consume)."""
    env, params = gft.make("MappingDisc-v0", n_agents=6)
    a = env.action_space(params).sample(jax.random.key(0))
    assert a.shape == (6,)
    state, _ = env.reset_env(jax.random.key(1), params)
    state, _, r, d, _ = env.step_env(jax.random.key(2), state, a, params)
    assert jnp.isfinite(r).all()


def test_iterative_target_selection_matches_topk():
    """The kt-round min extraction in _mapping_helpers (the TPU-fast
    replacement for jax.lax.top_k over the 10,000-wide target axis) is
    exactly equivalent to stable top_k after the valid-zeroing: same
    obs_target, newly, credit — fuzzed over densities including ties
    (lattice targets make exact distance ties common), nearly-exhausted
    and fully-exhausted unobserved sets."""
    env, params = gft.make("Mapping-v0", n_agents=12)
    rng = np.random.RandomState(0)
    kt = params.nearest_targets
    tgt = np.asarray(params.target_x)

    def topk_reference(x, unobserved):
        diff_t = x[:, None, 0:2] - tgt[None, :, :]
        r2_t = diff_t[..., 0] ** 2 + diff_t[..., 1] ** 2
        r2_m = np.where(unobserved[None, :], r2_t, np.inf)
        neg, idx = jax.lax.top_k(jnp.asarray(-r2_m), kt)
        valid = np.isfinite(-np.asarray(neg))
        td = np.take_along_axis(diff_t, np.asarray(idx)[:, :, None], axis=1)
        td = np.where(valid[:, :, None], td, 0.0)
        obs_t = td.reshape((x.shape[0], kt * 2))
        # the argmin-formulation reference for newly/credit (the rewrite
        # replaced these with first-match mins too)
        newly = unobserved & (np.min(r2_m, axis=0) < float(params.obs_rad2))
        nearest_agent = np.argmin(r2_m, axis=0)
        credit = np.zeros((x.shape[0],))
        np.maximum.at(credit, nearest_agent, newly.astype(np.float64))
        return obs_t, newly, credit

    for frac in (1.0, 0.5, 0.01, 0.0005, 0.0):
        x = np.zeros((12, 4))
        # half the agents sit EXACTLY on lattice points -> exact ties
        x[:, 0] = rng.uniform(-params.px_max, params.px_max, 12)
        x[:, 1] = rng.uniform(-params.py_max, params.py_max, 12)
        x[:6, 0:2] = tgt[rng.choice(len(tgt), 6, replace=False)]
        unobserved = rng.rand(len(tgt)) < frac
        values, network, obs_target, newly, credit = _mapping_helpers(
            jnp.asarray(x), jnp.asarray(unobserved), params
        )
        ref_obs, ref_newly, ref_credit = topk_reference(x, unobserved)
        np.testing.assert_allclose(np.asarray(obs_target), ref_obs, rtol=0, atol=0)
        np.testing.assert_array_equal(np.asarray(newly), ref_newly)
        np.testing.assert_allclose(np.asarray(credit), ref_credit, rtol=0, atol=0)


def test_mapping_bit_exact_parity_mode():
    """VERDICT r4 next #5 (third family): with parity_exact=True a 30-step
    closed loop driven by the reference's own greedy expert — state, obs,
    network, reward, done — EQUALS the live reference bit-for-bit at x64
    (old/mapping.py:139-232).  Selection ties (the one in-principle
    unreproducible case: the reference's unstable argsort) do not occur
    on these generic float states."""
    ref = _ref_env("mapping", "MappingEnv")
    rng = np.random.RandomState(11)
    x0 = _fresh_ref_state(ref, rng)
    ref.compute_helpers()  # prime the cached greedy_action like reset does

    env, params = gft.make("Mapping-v0")
    params = params.replace(parity_exact=True)
    state = _our_state(x0, params)
    # prime last_obs_target identically (reset's helpers pass)
    _, _, obs_t, newly0, _ = _mapping_helpers(state.x, state.unobserved, params)
    state = state.replace(last_obs_target=obs_t)
    # the reference reset retires in-radius targets via compute_helpers;
    # our probe state starts all-unobserved on both sides, so apply the
    # same retirement to BOTH (the reference already did via the call
    # above)
    state = state.replace(unobserved=state.unobserved & ~np.asarray(newly0))

    step = jax.jit(env.step_env)
    ctrl = jax.jit(env.controller)
    key = jax.random.key(0)

    for t in range(30):
        u_ref = ref.controller()
        u = ctrl(state, params)
        np.testing.assert_array_equal(np.asarray(u), u_ref, err_msg=f"u@{t}")
        (ref_obs, ref_net), ref_r, ref_done, _ = ref.step(np.asarray(u).copy())
        state, (obs, net), r, d, _ = step(key, state, jnp.asarray(u), params)
        np.testing.assert_array_equal(np.asarray(state.x), ref.x, err_msg=f"x@{t}")
        np.testing.assert_array_equal(np.asarray(obs), ref_obs, err_msg=f"obs@{t}")
        np.testing.assert_array_equal(np.asarray(net), ref_net, err_msg=f"net@{t}")
        assert float(r) == ref_r, f"rew@{t}: {float(r)} vs {ref_r}"

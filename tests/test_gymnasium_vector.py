"""GymnasiumVectorEnv facade: batched device stepping, NumPy surface,
same-step autoreset, terminated/truncated split per family."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import gym_flock_tpu as gft
from gym_flock_tpu.compat.gymnasium_vector import (
    GymnasiumVectorEnv,
    batch_space,
    make_gymnasium_vector,
)
from gym_flock_tpu.core.spaces import Box, DictSpace, MultiDiscrete


def test_flocking_vector_basic():
    B = 8
    venv = make_gymnasium_vector("FlockingRelative-v0", num_envs=B, n_agents=16)
    obs, infos = venv.reset(seed=0)
    values, network = obs
    assert isinstance(values, np.ndarray) and values.shape == (B, 16, 6)
    assert network.shape == (B, 16, 16)

    u = venv.controller()
    assert isinstance(u, np.ndarray) and u.shape == (B, 16, 2)

    obs2, rew, term, trunc, infos = venv.step(u)
    assert rew.shape == (B,) and rew.dtype.kind == "f"
    assert term.dtype == bool and trunc.dtype == bool
    assert not term.any()  # flocking is time-driven: never terminal
    assert not trunc.any()  # far from the 1000-step limit


def test_flocking_vector_determinism():
    venv1 = make_gymnasium_vector("FlockingRelative-v0", num_envs=4, n_agents=12)
    venv2 = make_gymnasium_vector("FlockingRelative-v0", num_envs=4, n_agents=12)
    o1, _ = venv1.reset(seed=7)
    o2, _ = venv2.reset(seed=7)
    np.testing.assert_array_equal(o1[0], o2[0])
    u = venv1.controller()
    r1 = venv1.step(u)[1]
    r2 = venv2.step(u)[1]
    np.testing.assert_array_equal(r1, r2)


def test_coverage_vector_autoreset_and_terminal_split():
    B = 6
    venv = make_gymnasium_vector(
        "Coverage-v0", num_envs=B, n_graphs=2, episode_length=3, max_steps=3
    )
    obs, _ = venv.reset(seed=1)
    assert set(obs) == {"nodes", "edges", "senders", "receivers", "step"}
    assert obs["nodes"].shape[0] == B

    saw_finish = False
    for t in range(8):
        u = venv.controller()
        obs, rew, term, trunc, infos = venv.step(u)
        if (term | trunc).any():
            saw_finish = True
            # coverage done is MDP-terminal (step counter is in the obs)
            assert term.any()
            fo = infos["final_observation"]
            mask = infos["_final_observation"]
            np.testing.assert_array_equal(mask, term | trunc)
            i = int(np.nonzero(mask)[0][0])
            assert fo[i] is not None and "nodes" in fo[i]
            # the returned obs row is POST-reset: its step counter restarts
            assert float(obs["step"][i, 0, 0]) <= 1.0
            # finished env's final obs carries the terminal step count
            assert float(fo[i]["step"][0, 0]) >= 2.0
        assert np.isfinite(rew).all()
    assert saw_finish, "3-step episodes must finish within 8 steps"


def test_vector_seeded_stream_survives_unseeded_reset():
    """A plain reset() after a seeded one CONTINUES the key stream (the
    gymnasium convention) — two identically-seeded runs stay identical
    through later unseeded resets."""
    a = make_gymnasium_vector("FlockingRelative-v0", num_envs=3, n_agents=8)
    b = make_gymnasium_vector("FlockingRelative-v0", num_envs=3, n_agents=8)
    a.reset(seed=11); b.reset(seed=11)
    oa, _ = a.reset()
    ob, _ = b.reset()
    np.testing.assert_array_equal(oa[0], ob[0])


def test_vector_zero_limit_disables_truncation():
    """max_episode_steps=0 disables the external limit (the make_gymnasium
    convention) instead of truncating every step."""
    venv = make_gymnasium_vector(
        "FlockingRelative-v0", num_envs=2, n_agents=8, max_episode_steps=0
    )
    venv.reset(seed=0)
    u = np.zeros((2, 8, 2), np.float32)
    for _ in range(3):
        _, _, term, trunc, _ = venv.step(u)
        assert not term.any() and not trunc.any()


def test_vector_registration_limit_truncates():
    # FlockingLeader-v0 registers max_episode_steps=200; with an override
    # of 2 the external counter must truncate (never terminate)
    venv = make_gymnasium_vector(
        "FlockingLeader-v0", num_envs=3, n_agents=10, max_episode_steps=2
    )
    venv.reset(seed=0)
    u = np.zeros((3, 10, 2), np.float32)
    _, _, term, trunc, _ = venv.step(u)
    assert not term.any() and not trunc.any()
    _, _, term, trunc, infos = venv.step(u)
    assert not term.any() and trunc.all()
    assert infos["_final_observation"].all()
    assert infos["_final_info"].all() and infos["final_info"][0] == {}
    # autoreset happened: the NEXT step starts a fresh episode
    _, _, term, trunc, _ = venv.step(u)
    assert not trunc.any()


def test_batch_space_shapes():
    env, params = gft.make("Coverage-v0", n_graphs=1)
    single_obs = env.observation_space(params)
    bobs = batch_space(single_obs, 5)
    assert isinstance(bobs, DictSpace)
    assert bobs.spaces["nodes"].shape[0] == 5
    bact = batch_space(env.action_space(params), 5)
    # MultiDiscrete batches flat with tiled per-dim cardinalities (exact
    # integer sampling + containment; reshape samples to [n, dims])
    assert isinstance(bact, MultiDiscrete)
    assert len(bact.nvec) == 5 * params.n_robots
    s = bact.sample(jax.random.key(0))  # integer sampling must work
    assert s.shape == (5 * params.n_robots,)

    venv = GymnasiumVectorEnv("FlockingRelative-v0", 4, n_agents=8)
    assert venv.single_action_space.shape == (8, 2)
    assert venv.action_space.shape == (4, 8, 2)

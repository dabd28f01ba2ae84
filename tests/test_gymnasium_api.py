"""Gymnasium-style (0.26+) API facade: 5-tuple step, seeded reset, TimeLimit.

The reference exposes gym-0.11 semantics (reference gym_flock/__init__.py,
test.py:43-70); ``compat.make_gymnasium`` is the modern-surface equivalent
a migrating user expects.  These tests pin the episode-boundary semantics
(terminated = env done, truncated = registration time limit) and that the
facade shares the legacy surface's determinism.
"""
import numpy as np
import pytest

from gym_flock_tpu.compat import make_gymnasium
from gym_flock_tpu.core.registry import registry


def test_flocking_reset_step_shapes_and_types():
    env = make_gymnasium("FlockingRelative-v0", n_agents=12)
    obs, info = env.reset(seed=0)
    assert isinstance(info, dict)
    u = env.controller()
    out = env.step(u)
    assert len(out) == 5
    obs2, reward, terminated, truncated, info = out
    assert isinstance(reward, float)
    assert isinstance(terminated, bool) and isinstance(truncated, bool)
    assert isinstance(info, dict)
    assert np.asarray(obs2[0]).shape == np.asarray(obs[0]).shape
    env.close()


def test_seeded_reset_is_deterministic():
    a = make_gymnasium("FlockingRelative-v0", n_agents=10)
    b = make_gymnasium("FlockingRelative-v0", n_agents=10)
    oa, _ = a.reset(seed=7)
    ob, _ = b.reset(seed=7)
    for la, lb in zip(np.asarray(oa[0]).ravel(), np.asarray(ob[0]).ravel()):
        assert la == lb
    # same stream after reset: identical first transition
    ua, ub = a.controller(), b.controller()
    np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
    sa, sb = a.step(ua), b.step(ub)
    np.testing.assert_allclose(np.asarray(sa[0][0]), np.asarray(sb[0][0]))
    assert sa[1] == sb[1]


def test_truncation_at_max_episode_steps():
    env = make_gymnasium("FlockingRelative-v0", n_agents=10, max_episode_steps=3)
    env.reset(seed=0)
    for i in range(3):
        _, _, terminated, truncated, _ = env.step(env.controller())
    assert not terminated and truncated
    # stepping past the boundary without reset is a usage error
    with pytest.raises(AssertionError):
        env.step(env.controller())
    env.reset()
    _, _, terminated, truncated, _ = env.step(env.controller())
    assert not truncated


def test_default_limit_comes_from_registration():
    env = make_gymnasium("FlockingRelative-v0", n_agents=10)
    assert env.max_episode_steps == registry["FlockingRelative-v0"].max_episode_steps
    # 0 disables the time limit
    env0 = make_gymnasium("FlockingRelative-v0", n_agents=10, max_episode_steps=0)
    assert env0.max_episode_steps is None


def test_coverage_terminates_via_env_done():
    env = make_gymnasium("Coverage-v0", n_graphs=1, max_episode_steps=0)
    env.reset(seed=1)
    terminated = truncated = False
    for _ in range(int(env.params.episode_length) + 1):
        _, _, terminated, truncated, _ = env.step(env.controller(greedy=True))
        if terminated:
            break
    # coverage's done flag (all visited OR in-env step limit,
    # reference coverage.py:357) must surface as terminated, not truncated
    assert terminated and not truncated


def test_legacy_passthrough_surface():
    env = make_gymnasium("Coverage-v0", n_graphs=1)
    env.reset(seed=0)
    assert env.unwrapped is env._legacy
    assert env.observation_space is not None
    assert env.action_space is not None
    # legacy extras forward through __getattr__
    assert env.keys[0] == "nodes"
    assert env.params.n_robots >= 1

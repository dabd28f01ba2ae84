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


def test_time_driven_done_is_truncation_at_registered_boundary():
    """ADVICE r2 (high): flocking-family done is purely time-driven
    (done = time >= params.max_steps, flocking.py:486) while the reference
    env always returns done=False and relies on gym's TimeLimit — at the
    registered boundary the modern API must report truncated, never
    terminated."""
    env = make_gymnasium(
        "FlockingRelative-v0", n_agents=10, max_steps=5, max_episode_steps=5
    )
    env.reset(seed=0)
    for _ in range(5):
        _, _, terminated, truncated, _ = env.step(env.controller())
    assert truncated and not terminated
    # env-internal limit below the wrapper limit: still a time limit
    env2 = make_gymnasium(
        "FlockingRelative-v0", n_agents=10, max_steps=3, max_episode_steps=10
    )
    env2.reset(seed=0)
    term = trunc = False
    for _ in range(3):
        _, _, term, trunc, _ = env2.step(env2.controller())
    assert trunc and not term


def test_mapping_mixed_done_semantics():
    """Mapping done = all-observed OR time (old/mapping.py): the terminal
    component maps to terminated, the time component to truncated."""
    zero_u = np.zeros((8, 2), dtype=np.float32)
    # time branch
    env = make_gymnasium("Mapping-v0", n_agents=8, max_steps=3)
    env.reset(seed=0)
    term = trunc = False
    for _ in range(3):
        _, _, term, trunc, _ = env.step(zero_u)
        if term or trunc:
            break
    assert trunc and not term
    # terminal branch: a huge obs radius observes every target on step 1
    env2 = make_gymnasium("Mapping-v0", n_agents=8, max_steps=100, obs_rad=1e6)
    env2.reset(seed=0)
    _, _, term2, trunc2, _ = env2.step(zero_u)
    assert term2 and not trunc2


def test_render_mode_contract():
    env = make_gymnasium("FlockingRelative-v0", n_agents=8, render_mode=None)
    env.reset(seed=0)
    assert env.render() is None  # ADVICE r2: gate on render_mode
    import matplotlib

    matplotlib.use("Agg", force=True)
    env_rgb = make_gymnasium(
        "FlockingRelative-v0", n_agents=8, render_mode="rgb_array"
    )
    env_rgb.reset(seed=0)
    frame = env_rgb.render()
    assert frame is not None and frame.ndim == 3 and frame.shape[2] == 3
    assert frame.dtype == np.uint8
    env_rgb.close()


def test_getattr_no_recursion_on_copy():
    import copy

    env = make_gymnasium("FlockingRelative-v0", n_agents=8)
    env.reset(seed=0)
    clone = copy.copy(env)  # reconstructs without __init__ under __reduce__
    assert clone.max_episode_steps == env.max_episode_steps
    with pytest.raises(AttributeError):
        env.__getattr__("_does_not_exist")
    with pytest.raises(AttributeError):
        env.no_such_attribute_anywhere


def test_unseeded_reset_uses_fresh_entropy():
    a = make_gymnasium("FlockingRelative-v0", n_agents=10)
    b = make_gymnasium("FlockingRelative-v0", n_agents=10)
    oa, _ = a.reset()
    ob, _ = b.reset()
    # 31 bits of entropy each: identical episodes would mean correlation
    assert not np.array_equal(np.asarray(oa[0]), np.asarray(ob[0]))
    # a second unseeded reset continues the same env's stream (no reseed)
    oa2, _ = a.reset()
    assert not np.array_equal(np.asarray(oa[0]), np.asarray(oa2[0]))


def test_legacy_passthrough_surface():
    env = make_gymnasium("Coverage-v0", n_graphs=1)
    env.reset(seed=0)
    assert env.unwrapped is env._legacy
    assert env.observation_space is not None
    assert env.action_space is not None
    # legacy extras forward through __getattr__
    assert env.keys[0] == "nodes"
    assert env.params.n_robots >= 1

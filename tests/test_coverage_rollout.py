"""Coverage under the rollout engine: autoreset resamples graphs mid-scan."""
import numpy as np
import jax
import jax.numpy as jnp

import gym_flock_tpu as gft
from gym_flock_tpu.parallel import batch_rollout, rollout


def test_coverage_batch_rollout_random_policy():
    env, params = gft.make("Coverage-v0", n_graphs=2)
    _, traj = jax.jit(
        lambda k: batch_rollout(env, params, k, n_envs=4, n_steps=10,
                                policy="random", keep_obs=False)
    )(jax.random.key(0))
    assert traj.reward.shape == (4, 10)
    assert np.isfinite(np.asarray(traj.reward)).all()


def test_coverage_autoreset_resamples_graph():
    # short episodes force autoreset inside the scan; with a 4-graph bank the
    # graph index should change across episode boundaries
    env, params = gft.make("Coverage-v0", n_graphs=4, episode_length=3, max_steps=3)

    def greedy(key, state, obs, p):
        return env.controller(state, p, key=key, greedy=True)

    state, traj = rollout(env, params, jax.random.key(1), n_steps=24, policy=greedy)
    d = np.asarray(traj.done)
    assert d.sum() >= 5  # several episode boundaries
    assert np.isfinite(np.asarray(traj.reward)).all()


def test_coverage_expert_policy_through_rollout():
    env, params = gft.make("Coverage-v0", n_graphs=1)

    def greedy(key, state, obs, p):
        return env.controller(state, p, key=key, greedy=True)

    _, traj = rollout(env, params, jax.random.key(2), n_steps=60, policy=greedy,
                      auto_reset=False)
    total = float(np.sum(np.asarray(traj.reward)))
    assert total > 20  # greedy expert makes steady coverage progress

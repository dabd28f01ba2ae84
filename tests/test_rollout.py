"""Rollout engine tests on the virtual 8-device CPU mesh."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gym_flock_tpu as gft
from gym_flock_tpu.parallel import batch_rollout, sharded_rollout, make_env_mesh


def test_single_rollout_scan():
    env, params = gft.make("FlockingRelative-v0", n_agents=20)
    from gym_flock_tpu.parallel import rollout
    state, traj = jax.jit(
        lambda key: rollout(env, params, key, n_steps=16, policy="expert")
    )(jax.random.key(0))
    assert traj.reward.shape == (16,)
    assert np.isfinite(np.asarray(traj.reward)).all()


def test_batch_rollout_vmap():
    env, params = gft.make("FlockingRelative-v0", n_agents=16)
    _, traj = jax.jit(
        lambda key: batch_rollout(env, params, key, n_envs=8, n_steps=5)
    )(jax.random.key(1))
    assert traj.reward.shape == (8, 5)
    # distinct seeds -> distinct trajectories
    r = np.asarray(traj.reward)
    assert len(np.unique(r[:, -1])) > 1


def test_sharded_rollout_8dev(devices8):
    env, params = gft.make("FlockingRelative-v0", n_agents=16)
    mesh = make_env_mesh("env", devices8[:8])
    traj, stats = sharded_rollout(
        env, params, jax.random.key(2), n_envs=16, n_steps=4, mesh=mesh
    )
    assert traj.reward.shape == (16, 4)
    assert np.isfinite(float(stats["mean_reward"]))

def test_autoreset_resets_time():
    env, params = gft.make("FlockingRelative-v0", n_agents=10)
    params = params.replace(max_steps=3)
    from gym_flock_tpu.parallel import rollout
    state, traj = rollout(env, params, jax.random.key(3), n_steps=7, policy="expert")
    d = np.asarray(traj.done)
    # episodes of length 3: done at t=2 and t=5 (0-indexed)
    assert d[2] and d[5] and not d[0] and not d[3]

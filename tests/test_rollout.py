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


@pytest.mark.slow  # sharded rollout is driver-exercised every round by dryrun_multichip; dp-mesh machinery covered fast by test_sharded_train_step_runs / test_sharded_dagger_iteration
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


def test_expert_rollout_fused_matches_unfused_loop():
    """expert_rollout (one pairwise pass per step) reproduces the unfused
    controller+step_env loop (same primitive sequence; float-epsilon
    differences only from XLA fusion/reassociation of the reductions)."""
    import numpy as np

    env, params = gft.make("FlockingRelative-v0", n_agents=48)
    state0, _ = env.reset_env(jax.random.key(4), params)

    # unfused loop
    state = state0
    xs, us, rs = [], [], []
    for _ in range(8):
        u = env.controller(state, params)
        state, _, r, _, _ = env.step_env(jax.random.key(0), state, u, params)
        xs.append(np.asarray(state.x))
        us.append(np.asarray(u))
        rs.append(float(r))

    final, traj = jax.jit(
        lambda s: env.expert_rollout(s, params, n_steps=8)
    )(state0)
    np.testing.assert_allclose(np.asarray(final.x), xs[-1], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(traj["u"]), np.stack(us), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(traj["reward"]), np.asarray(rs), rtol=1e-3, atol=1e-4)
    assert int(final.time) == int(state0.time) + 8


def test_expert_rollout_decentralized_matches_unfused():
    import numpy as np

    env, params = gft.make("FlockingRelative-v0", n_agents=32)
    state0, _ = env.reset_env(jax.random.key(9), params)
    state = state0
    for _ in range(4):
        u = env.controller(state, params, centralized=False)
        state, _, _, _, _ = env.step_env(jax.random.key(0), state, u, params)
    final, traj = env.expert_rollout(state0, params, n_steps=4, centralized=False)
    np.testing.assert_allclose(np.asarray(final.x), np.asarray(state.x), rtol=2e-4, atol=1e-5)


@pytest.mark.slow  # large-N variant; sparse rollout covered in test_sparse_flocking
def test_expert_rollout_sparse_matches_dense_large():
    """The sparse env's fused rollout (one Hilbert sort per step) tracks the
    dense-kernel env from the same reset."""
    import numpy as np

    env_s, params = gft.make("FlockingSparse-v0", n_agents=256, max_reset_tries=4)
    env_l, _ = gft.make("FlockingLarge-v0", n_agents=256, max_reset_tries=4)
    state, _ = env_s.reset_env(jax.random.key(1), params)

    fin_s, traj_s = env_s.expert_rollout(state, params, n_steps=5)
    fin_l, traj_l = env_l.expert_rollout(state, params, n_steps=5)
    np.testing.assert_allclose(
        np.asarray(fin_s.x), np.asarray(fin_l.x), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(traj_s["reward"]), np.asarray(traj_l["reward"]), rtol=1e-5
    )


def test_batch_expert_rollout_matches_per_env():
    """Public fused batch API == per-env expert_rollout from the same keys,
    and the sharded form == the vmapped form."""
    import numpy as np

    from gym_flock_tpu.parallel import batch_expert_rollout, make_env_mesh

    env, params = gft.make("FlockingRelative-v0", n_agents=16)
    key = jax.random.key(7)
    finals, traj = batch_expert_rollout(env, params, key, n_envs=8, n_steps=4)
    assert traj["u"].shape == (8, 4, 16, 2)
    assert traj["network"].shape == (8, 4, 16, 16)

    keys = jax.random.split(key, 8)
    k0, _ = jax.random.split(keys[2])
    s0, _ = env.reset_env(k0, params)
    fin, tr = env.expert_rollout(s0, params, 4)
    np.testing.assert_allclose(
        np.asarray(traj["u"][2]), np.asarray(tr["u"]), atol=1e-6
    )


@pytest.mark.slow  # sharded == vmapped form; mesh machinery also covered by test_sharded_rollout coverage in dryrun_multichip and agent_shard tests
def test_batch_expert_rollout_sharded_matches_vmapped():
    import numpy as np

    from gym_flock_tpu.parallel import batch_expert_rollout, make_env_mesh

    env, params = gft.make("FlockingRelative-v0", n_agents=16)
    key = jax.random.key(7)
    finals, traj = batch_expert_rollout(env, params, key, n_envs=8, n_steps=4)
    mesh = make_env_mesh("env")
    finals_s, traj_s = batch_expert_rollout(
        env, params, key, n_envs=8, n_steps=4, mesh=mesh
    )
    np.testing.assert_allclose(
        np.asarray(traj_s["reward"]), np.asarray(traj["reward"]), atol=1e-6
    )


def test_expert_rollout_stochastic_variant_semantics():
    """FlockingStochastic's fused rollout applies its own step semantics
    (action clip, x6 scaling, per-step dt): with sigma=0 it equals the
    unfused step_with_dt loop exactly."""
    import numpy as np

    env, params = gft.make("FlockingStochastic-v0", n_agents=24)
    p0 = params.replace(dt_sigma=0.0)
    state0, _ = env.reset_env(jax.random.key(2), p0)

    state = state0
    for _ in range(5):
        u = env.controller(state, p0)
        state, _, _, _, _ = env.step_with_dt(state, u, p0.dt_mean, p0)

    final, traj = env.expert_rollout(state0, p0, n_steps=5)
    np.testing.assert_allclose(
        np.asarray(final.x), np.asarray(state.x), rtol=2e-4, atol=1e-5
    )

    # nonzero sigma: trajectories stay finite and differ across keys
    f1, _ = env.expert_rollout(state0, params, 5, key=jax.random.key(1))
    f2, _ = env.expert_rollout(state0, params, 5, key=jax.random.key(2))
    assert np.all(np.isfinite(np.asarray(f1.x)))
    assert not np.allclose(np.asarray(f1.x), np.asarray(f2.x))


def test_expert_rollout_absolute_env_obs():
    """FlockingAbsolute's fused rollout emits its REAL observation (top-k
    neighbor table) and matches the unfused loop."""
    import numpy as np

    env, params = gft.make("Flocking-v0", n_agents=24)
    state0, _ = env.reset_env(jax.random.key(6), params)

    state = state0
    for _ in range(4):
        u = env.controller(state, params)
        state, (obs, net), _, _, _ = env.step_env(jax.random.key(0), state, u, params)

    final, traj = env.expert_rollout(state0, params, n_steps=4)
    assert traj["values"].shape == (4, 24, params.n_neighbors * 4)
    np.testing.assert_allclose(
        np.asarray(final.x), np.asarray(state.x), rtol=2e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(traj["values"][-1]), np.asarray(obs), rtol=2e-4, atol=1e-5
    )

"""Coverage graph-MDP parity vs the reference NumPy implementation.

The same graph (target positions) is injected into both implementations via
the reference's ``_initialize_graph`` and our ``build_graph_spec``; both are
then driven from identical robot placements / visited sets with identical
action sequences.  Buffers, rewards, dones, and the greedy expert must match.
"""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from gym_flock_tpu.envs.coverage import CoverageEnv, CoverageParams
from gym_flock_tpu.envs.coverage_graph import (
    build_graph_bank,
    build_graph_spec,
    construct_time_matrix,
    generate_coverage_targets,
)

from tests.reference_oracle import reference_available, make_reference_env

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference checkout not available"
)

N_ROBOTS = 6
MAX_NODES = 500


@pytest.fixture(scope="module")
def shared_graph():
    rng = np.random.RandomState(11)
    while True:
        targets = generate_coverage_targets(rng)
        if 50 <= targets.shape[0] <= MAX_NODES - N_ROBOTS:
            return targets


@pytest.fixture(scope="module")
def ref_env(shared_graph):
    env = make_reference_env("Coverage-v0").__class__(init_graph=False)
    env._initialize_graph(shared_graph.copy())
    return env


@pytest.fixture(scope="module")
def our_env(shared_graph):
    spec = build_graph_spec(
        shared_graph, MAX_NODES - N_ROBOTS, N_ROBOTS, motion_radius=5.5 * 1.2,
        horizon=10,
    )
    bank = build_graph_bank([spec])
    env = CoverageEnv()
    params = CoverageParams(bank=bank)
    return env, params


def _sync_states(ref, our_params, robot_loc, unvisited):
    """Place both impls in the same state; return our CoverageState."""
    from gym_flock_tpu.envs.coverage import CoverageState

    n_targets = ref.n_targets
    ref.episode_reward = 0
    ref.step_counter = 0
    ref.cached_solution = None
    ref.last_loc = None
    ref.graph_previous = None
    ref.graph_cost = None
    ref.x[:N_ROBOTS, 0:2] = ref.x[np.asarray(robot_loc) + N_ROBOTS, 0:2]
    ref.visited.fill(1)
    ref.visited[np.asarray(unvisited) + N_ROBOTS] = 0
    ref.node_history = np.zeros((ref.n_agents, 1))

    T = our_params.max_targets
    visited = np.ones((T,))
    visited[np.asarray(unvisited)] = 0.0
    state = CoverageState(
        time=jnp.int32(0),
        graph=jnp.int32(0),
        robot_loc=jnp.asarray(robot_loc, dtype=jnp.int32),
        visited=jnp.asarray(visited),
        discovered=jnp.zeros((T,)),
        episode_reward=jnp.float32(0),
        last_loc=jnp.full((len(robot_loc),), -1, dtype=jnp.int32),
    )
    return state


def _ref_obs(ref):
    obs, reward, done = ref._get_obs_reward()
    return obs, reward, done


def _check_obs(obs, ref_obs, n_agents, msg=""):
    np.testing.assert_allclose(
        np.asarray(obs["nodes"])[:n_agents], ref_obs["nodes"][:n_agents],
        atol=1e-6, err_msg=f"nodes {msg}",
    )
    np.testing.assert_array_equal(
        np.asarray(obs["senders"]), ref_obs["senders"].flatten(), err_msg=f"senders {msg}"
    )
    np.testing.assert_array_equal(
        np.asarray(obs["receivers"]), ref_obs["receivers"].flatten(), err_msg=f"receivers {msg}"
    )
    np.testing.assert_allclose(
        np.asarray(obs["edges"]), ref_obs["edges"], atol=1e-5, err_msg=f"edges {msg}"
    )


def test_time_matrix_matches_reference(ref_env, shared_graph):
    cost_ref, prev_ref = ref_env.construct_time_matrix()
    d = np.linalg.norm(
        shared_graph[:, None, :] - shared_graph[None, :, :], axis=2
    )
    adj = (d <= 5.5 * 1.2) & (d > 0)
    s, r = np.nonzero(adj)
    cost, prev = construct_time_matrix(s, r, shared_graph.shape[0], horizon=10)
    np.testing.assert_array_equal(cost, cost_ref)
    np.testing.assert_array_equal(prev, prev_ref)


def test_obs_and_random_walk_parity(ref_env, our_env):
    env, params = our_env
    rng = np.random.RandomState(0)
    n_t = ref_env.n_targets
    robot_loc = rng.choice(n_t, size=(N_ROBOTS,), replace=False)
    unvisited = rng.choice(n_t, size=(n_t // 2,), replace=False)

    state = _sync_states(ref_env, params, robot_loc, unvisited)

    ref_obs, ref_r, ref_done = _ref_obs(ref_env)
    obs, r, done, state = env._obs_reward(state, params)
    _check_obs(obs, ref_obs, ref_env.n_agents, "init")
    assert float(r) == ref_r

    step = jax.jit(env.step_env)
    key = jax.random.key(0)
    for t in range(30):
        action = rng.randint(0, 4, size=(N_ROBOTS,))
        ref_obs, ref_r, ref_done, _ = ref_env.step(action.copy())
        state, obs, r, done, _ = step(key, state, jnp.asarray(action), params)
        assert float(r) == ref_r, f"reward mismatch t={t}"
        assert bool(done) == ref_done, f"done mismatch t={t}"
        np.testing.assert_array_equal(
            np.asarray(state.robot_loc) + N_ROBOTS,
            ref_env.closest_targets,
            err_msg=f"robot locations t={t}",
        )
        _check_obs(obs, ref_obs, ref_env.n_agents, f"t={t}")


def test_greedy_expert_parity(ref_env, our_env):
    env, params = our_env
    rng = np.random.RandomState(1)
    n_t = ref_env.n_targets
    robot_loc = rng.choice(n_t, size=(N_ROBOTS,), replace=False)
    unvisited = rng.choice(n_t, size=(n_t // 2,), replace=False)

    state = _sync_states(ref_env, params, robot_loc, unvisited)
    _ref_obs(ref_env)
    _, _, _, state = env._obs_reward(state, params)

    key = jax.random.key(0)
    for t in range(40):
        ref_u = ref_env.controller(greedy=True)
        u = env.controller(state, params, greedy=True)
        np.testing.assert_array_equal(
            np.asarray(u), ref_u, err_msg=f"greedy action t={t}"
        )
        ref_obs, ref_r, ref_done, _ = ref_env.step(ref_u.copy())
        state, obs, r, done, _ = env.step_env(key, state, u, params)
        assert float(r) == ref_r, f"reward t={t}"
        if ref_done:
            break


def test_collision_resolution_order_dependence(ref_env, our_env):
    """Two robots targeting the same node: lower index wins, higher stays."""
    env, params = our_env
    nbr = np.asarray(params.bank["neighbor_table"][0])
    # find a node with a neighbor that is also reachable from another node
    # (drive both robots to the same receiver)
    found = None
    n_t = ref_env.n_targets
    for a in range(n_t):
        for ai in range(4):
            b = nbr[a, ai]
            if b == a:
                continue
            # robot1 on some node c != a with neighbor b
            for c in range(n_t):
                if c in (a, b):
                    continue
                for ci in range(4):
                    if nbr[c, ci] == b:
                        found = (a, ai, c, ci, b)
                        break
                if found:
                    break
            if found:
                break
        if found:
            break
    assert found
    a, ai, c, ci, b = found
    others = [t for t in range(n_t) if t not in (a, b, c)][: N_ROBOTS - 2]
    robot_loc = [a, c] + others
    # others take action that keeps them in place if possible: action 3 may
    # move them; instead give them their own index actions and just compare
    state = _sync_states(ref_env, params, robot_loc, [b])
    _ref_obs(ref_env)
    _, _, _, state = env._obs_reward(state, params)

    action = np.array([ai, ci] + [0] * (N_ROBOTS - 2))
    ref_env.step(action.copy())
    state, *_ = env.step_env(jax.random.key(0), state, jnp.asarray(action), params)
    np.testing.assert_array_equal(
        np.asarray(state.robot_loc) + N_ROBOTS, ref_env.closest_targets
    )
    assert int(state.robot_loc[0]) == b  # robot 0 won the node
    assert int(state.robot_loc[1]) == c  # robot 1 stayed


def test_hide_nodes_explore_parity(shared_graph):
    """Explore mode: discovery masking + frontier flags vs reference."""
    ref = make_reference_env("Coverage-v0").__class__(
        init_graph=False, hide_nodes=True, n_node_feat=4
    )
    ref._initialize_graph(shared_graph.copy())

    spec = build_graph_spec(
        shared_graph, MAX_NODES - N_ROBOTS, N_ROBOTS, motion_radius=5.5 * 1.2,
        horizon=10,
    )
    env = CoverageEnv()
    params = CoverageParams(
        bank=build_graph_bank([spec]), hide_nodes=True, n_node_feat=4
    )

    rng = np.random.RandomState(2)
    n_t = ref.n_targets
    robot_loc = rng.choice(n_t, size=(N_ROBOTS,), replace=False)
    unvisited = rng.choice(n_t, size=(n_t // 2,), replace=False)

    state = _sync_states(ref, params, robot_loc, unvisited)
    ref.discovered_nodes = np.vstack(
        (np.ones((N_ROBOTS, 1)), np.zeros((ref.max_nodes - N_ROBOTS, 1)))
    )

    ref_obs, ref_r, _ = _ref_obs(ref)
    obs, r, done, state = env._obs_reward(state, params)
    _check_obs(obs, ref_obs, ref.n_agents, "init")

    key = jax.random.key(0)
    for t in range(20):
        ref_u = ref.controller(greedy=True)
        u = env.controller(state, params, greedy=True)
        np.testing.assert_array_equal(np.asarray(u), ref_u, err_msg=f"t={t}")
        ref_obs, ref_r, ref_done, _ = ref.step(ref_u.copy())
        state, obs, r, done, _ = env.step_env(key, state, u, params)
        assert float(r) == ref_r, f"reward t={t}"
        _check_obs(obs, ref_obs, ref.n_agents, f"t={t}")
        # discovery masks must agree
        np.testing.assert_array_equal(
            np.asarray(state.discovered),
            ref.discovered_nodes[N_ROBOTS : N_ROBOTS + params.max_targets, 0],
            err_msg=f"discovered t={t}",
        )


def test_last_edge_feature_parity(shared_graph):
    """LAST_EDGE_FEATURE flag: 2-column edge features with last-move flags.

    The reference reads these flags from module globals at call time; using
    them requires also bumping N_EDGE_FEAT (the buffer allocation constant),
    exactly as a user of the reference would edit coverage.py:44 and :35.
    """
    import gym_flock.envs.spatial.coverage as ref_mod

    old_flag, old_feat = ref_mod.LAST_EDGE_FEATURE, ref_mod.N_EDGE_FEAT
    ref_mod.LAST_EDGE_FEATURE, ref_mod.N_EDGE_FEAT = True, 2
    try:
        ref = ref_mod.CoverageEnv(init_graph=False)
        ref._initialize_graph(shared_graph.copy())

        spec = build_graph_spec(
            shared_graph, MAX_NODES - N_ROBOTS, N_ROBOTS,
            motion_radius=5.5 * 1.2, horizon=10,
        )
        env = CoverageEnv()
        params = CoverageParams(
            bank=build_graph_bank([spec]), last_edge_feature=True
        )

        rng = np.random.RandomState(5)
        n_t = ref.n_targets
        robot_loc = rng.choice(n_t, size=(N_ROBOTS,), replace=False)
        unvisited = rng.choice(n_t, size=(n_t // 2,), replace=False)
        state = _sync_states(ref, params, robot_loc, unvisited)

        ref_obs, _, _ = _ref_obs(ref)
        obs, _, _, state = env._obs_reward(state, params)
        np.testing.assert_allclose(np.asarray(obs["edges"]), ref_obs["edges"], atol=1e-5)

        key = jax.random.key(0)
        for t in range(15):
            action = rng.randint(0, 4, size=(N_ROBOTS,))
            ref_obs, ref_r, _, _ = ref.step(action.copy())
            state, obs, r, _, _ = env.step_env(key, state, jnp.asarray(action), params)
            assert float(r) == ref_r
            np.testing.assert_allclose(
                np.asarray(obs["edges"]), ref_obs["edges"], atol=1e-5,
                err_msg=f"edges t={t}",
            )
            np.testing.assert_array_equal(
                np.asarray(obs["senders"]), ref_obs["senders"].flatten()
            )
        # the flag column must actually fire sometimes
        assert np.asarray(obs["edges"])[:, 0].sum() > 0
    finally:
        ref_mod.LAST_EDGE_FEATURE, ref_mod.N_EDGE_FEAT = old_flag, old_feat


def test_comm_edges_parity(shared_graph):
    """COMM_EDGES flag: robot-robot edges appended at the buffer tail.

    Exact buffer parity holds when all robot pairs are in range (the static
    R*(R-1) slots are all valid) — guaranteed here by nearby starts.
    """
    from tests.reference_oracle import load_reference

    load_reference()
    import gym_flock.envs.spatial.coverage as ref_mod

    old_flag = ref_mod.COMM_EDGES
    ref_mod.COMM_EDGES = True
    try:
        ref = ref_mod.CoverageEnv(init_graph=False)
        ref._initialize_graph(shared_graph.copy())

        spec = build_graph_spec(
            shared_graph, MAX_NODES - N_ROBOTS, N_ROBOTS,
            motion_radius=5.5 * 1.2, horizon=10,
        )
        env = CoverageEnv()
        params = CoverageParams(bank=build_graph_bank([spec]), comm_edges=True)

        rng = np.random.RandomState(6)
        n_t = ref.n_targets
        # co-located cluster of starts => all pairwise distances < 100
        robot_loc = np.arange(N_ROBOTS) + 3
        unvisited = rng.choice(n_t, size=(n_t // 2,), replace=False)
        state = _sync_states(ref, params, robot_loc, unvisited)

        ref_obs, _, _ = _ref_obs(ref)
        obs, _, _, state = env._obs_reward(state, params)
        np.testing.assert_array_equal(
            np.asarray(obs["senders"]), ref_obs["senders"].flatten()
        )
        np.testing.assert_array_equal(
            np.asarray(obs["receivers"]), ref_obs["receivers"].flatten()
        )
        np.testing.assert_allclose(np.asarray(obs["edges"]), ref_obs["edges"], atol=1e-5)

        key = jax.random.key(0)
        for t in range(10):
            action = rng.randint(0, 4, size=(N_ROBOTS,))
            ref_obs, ref_r, _, _ = ref.step(action.copy())
            state, obs, r, _, _ = env.step_env(key, state, jnp.asarray(action), params)
            assert float(r) == ref_r
            np.testing.assert_array_equal(
                np.asarray(obs["senders"]), ref_obs["senders"].flatten(),
                err_msg=f"senders t={t}",
            )
            np.testing.assert_allclose(
                np.asarray(obs["edges"]), ref_obs["edges"], atol=1e-5,
                err_msg=f"edges t={t}",
            )
    finally:
        ref_mod.COMM_EDGES = old_flag


@pytest.mark.parametrize("graph_seed", [23, 47])
def test_parity_soak_additional_graphs(graph_seed):
    """Random-walk + greedy parity on additional independent graphs."""
    rng_g = np.random.RandomState(graph_seed)
    while True:
        targets = generate_coverage_targets(rng_g)
        if 50 <= targets.shape[0] <= MAX_NODES - N_ROBOTS:
            break
    ref = make_reference_env("Coverage-v0").__class__(init_graph=False)
    ref._initialize_graph(targets.copy())

    spec = build_graph_spec(
        targets, MAX_NODES - N_ROBOTS, N_ROBOTS, motion_radius=5.5 * 1.2, horizon=10
    )
    env = CoverageEnv()
    params = CoverageParams(bank=build_graph_bank([spec]))

    rng = np.random.RandomState(graph_seed + 1)
    n_t = ref.n_targets
    robot_loc = rng.choice(n_t, size=(N_ROBOTS,), replace=False)
    unvisited = rng.choice(n_t, size=(n_t // 2,), replace=False)
    state = _sync_states(ref, params, robot_loc, unvisited)
    _ref_obs(ref)
    _, _, _, state = env._obs_reward(state, params)

    key = jax.random.key(0)
    for t in range(12):
        action = rng.randint(0, 4, size=(N_ROBOTS,))
        ref_obs, ref_r, _, _ = ref.step(action.copy())
        state, obs, r, _, _ = env.step_env(key, state, jnp.asarray(action), params)
        assert float(r) == ref_r, f"seed {graph_seed} t={t}"
        _check_obs(obs, ref_obs, ref.n_agents, f"seed {graph_seed} t={t}")
    for t in range(12):
        ref_u = ref.controller(greedy=True)
        u = env.controller(state, params, greedy=True)
        np.testing.assert_array_equal(np.asarray(u), ref_u)
        ref.step(ref_u.copy())
        state, _, r, _, _ = env.step_env(key, state, u, params)


def test_comm_edges_parity_sparse_connectivity(shared_graph):
    """COMM_EDGES with a SMALL comm radius: only some robot pairs are in
    range, so the reference's tail block shrinks and shifts per step.  The
    dynamic-offset layout must match senders/receivers exactly and edge
    features on all live (sender != -1) rows.  (Dead gap rows keep stale
    features in the reference — documented deviation: we zero them.)
    """
    from tests.reference_oracle import load_reference

    load_reference()
    import gym_flock.envs.spatial.coverage as ref_mod

    old_flag = ref_mod.COMM_EDGES
    ref_mod.COMM_EDGES = True
    try:
        ref = ref_mod.CoverageEnv(init_graph=False)
        ref._initialize_graph(shared_graph.copy())
        ref.comm_radius = 90.0  # smaller than the map extent: partial connectivity

        spec = build_graph_spec(
            shared_graph, MAX_NODES - N_ROBOTS, N_ROBOTS,
            motion_radius=5.5 * 1.2, horizon=10,
        )
        env = CoverageEnv()
        params = CoverageParams(
            bank=build_graph_bank([spec]), comm_edges=True, comm_radius=90.0
        )

        rng = np.random.RandomState(9)
        n_t = ref.n_targets
        # spread-out starts => partial connectivity
        robot_loc = rng.choice(n_t, size=(N_ROBOTS,), replace=False)
        unvisited = rng.choice(n_t, size=(n_t // 2,), replace=False)
        state = _sync_states(ref, params, robot_loc, unvisited)

        key = jax.random.key(0)
        saw_partial = False
        ref_obs, _, _ = _ref_obs(ref)
        obs, _, _, state = env._obs_reward(state, params)
        for t in range(12):
            ref_s = ref_obs["senders"].flatten()
            np.testing.assert_array_equal(
                np.asarray(obs["senders"]), ref_s, err_msg=f"senders t={t}"
            )
            np.testing.assert_array_equal(
                np.asarray(obs["receivers"]),
                ref_obs["receivers"].flatten(),
                err_msg=f"receivers t={t}",
            )
            live = ref_s != -1
            np.testing.assert_allclose(
                np.asarray(obs["edges"])[live],
                ref_obs["edges"][live],
                atol=1e-5,
                err_msg=f"edges t={t}",
            )
            # count comm edges this step: tail rows with both ends < N_ROBOTS
            both_robot = live & (ref_s < N_ROBOTS) & (ref_obs["receivers"].flatten() < N_ROBOTS)
            n_comm = int(np.sum(both_robot))
            if 0 < n_comm < N_ROBOTS * (N_ROBOTS - 1):
                saw_partial = True

            action = rng.randint(0, 4, size=(N_ROBOTS,))
            ref_obs, ref_r, _, _ = ref.step(action.copy())
            state, obs, r, _, _ = env.step_env(key, state, jnp.asarray(action), params)
            assert float(r) == ref_r, f"reward t={t}"
        assert saw_partial, "test never exercised partial connectivity"
    finally:
        ref_mod.COMM_EDGES = old_flag


def test_use_pos_delta_broken_upstream():
    """Pin the upstream USE_POS_DELTA breakage (both branches):

    1. with the stock N_EDGE_FEAT=1, __init__ crashes writing the [E,2]
       motion diffs into the 1-wide edge buffer (coverage.py:594);
    2. with the buffer width patched to 3, _get_obs_reward crashes at
       coverage.py:287 (non-COMM) / :284 (COMM): action_dist is doubled
       for the bidirectional edges but action_diff is not.

    Our ``pos_delta`` param implements the repaired intended semantics
    (see CoverageParams / test_pos_delta_edges_self_consistent)."""
    import importlib

    from tests.reference_oracle import load_reference

    load_reference()
    cov = importlib.import_module("gym_flock.envs.spatial.coverage")
    saved = (cov.USE_POS_DELTA, cov.COMM_EDGES, cov.N_EDGE_FEAT)
    try:
        cov.USE_POS_DELTA = True
        cov.COMM_EDGES = False
        np.random.seed(0)
        with pytest.raises(ValueError):
            cov.CoverageEnv()  # coverage.py:594

        cov.N_EDGE_FEAT = 3
        for comm in (False, True):
            cov.COMM_EDGES = comm
            np.random.seed(0)
            with pytest.raises(ValueError):
                env = cov.CoverageEnv()
                env.reset()  # coverage.py:287 / :284
    finally:
        cov.USE_POS_DELTA, cov.COMM_EDGES, cov.N_EDGE_FEAT = saved


@pytest.mark.parametrize("last_edge", [False, True])
def test_pos_delta_edges_self_consistent(shared_graph, last_edge):
    """Repaired pos_delta mode: [flag?, dx, dy, dist] edges where
    norm(dx, dy) == dist on every real edge, reversed tail duplicates
    negate the delta, and the dist column is IDENTICAL to the
    (reference-parity-tested) non-delta mode's dist."""
    spec = build_graph_spec(
        shared_graph, MAX_NODES - N_ROBOTS, N_ROBOTS, motion_radius=5.5 * 1.2,
        horizon=10,
    )
    bank = build_graph_bank([spec])
    env = CoverageEnv()
    params = CoverageParams(bank=bank, pos_delta=True, last_edge_feature=last_edge)

    key = jax.random.key(0)
    state, obs = env.reset_env(key, params)
    # take one step so last_loc is set (exercises the flag column)
    u = env.controller(state, params, greedy=True)
    state, obs, _, _, _ = env.step_env(jax.random.key(1), state, u, params)

    edges = np.asarray(obs["edges"])
    senders = np.asarray(obs["senders"])
    assert edges.shape[1] == (4 if last_edge else 3)
    off = 1 if last_edge else 0
    dx, dy, dist = edges[:, off], edges[:, off + 1], edges[:, off + 2]

    valid = senders != -1
    np.testing.assert_allclose(
        np.sqrt(dx[valid] ** 2 + dy[valid] ** 2), dist[valid], rtol=1e-5, atol=1e-6
    )

    # tail block: last 2*R*A rows; second half is the reversed duplicates
    RA = N_ROBOTS * 4
    fwd = edges[-2 * RA : -RA]
    rev = edges[-RA:]
    np.testing.assert_allclose(rev[:, off], -fwd[:, off], atol=1e-6)
    np.testing.assert_allclose(rev[:, off + 1], -fwd[:, off + 1], atol=1e-6)
    np.testing.assert_allclose(rev[:, off + 2], fwd[:, off + 2], atol=1e-6)

    # dist column == non-delta mode's dist (bitwise same inputs)
    state_n, _ = env.reset_env(key, params.replace(pos_delta=False))
    state_n, obs_n, _, _, _ = env.step_env(
        jax.random.key(1), state_n, u, params.replace(pos_delta=False)
    )
    edges_n = np.asarray(obs_n["edges"])
    if last_edge:
        # non-delta last-edge layout keeps the reference cross-column quirk:
        # motion rows carry dist in col 0, tail rows [flag, dist]
        n_tail = 2 * RA
        np.testing.assert_allclose(dist[:-n_tail], edges_n[:-n_tail, 0], atol=1e-6)
        np.testing.assert_allclose(dist[-n_tail:], edges_n[-n_tail:, 1], atol=1e-6)
        np.testing.assert_allclose(edges[-n_tail:, 0], edges_n[-n_tail:, 0], atol=0)
    else:
        np.testing.assert_allclose(dist, edges_n[:, 0], atol=1e-6)


def test_pos_delta_comm_edges_mode(shared_graph):
    """pos_delta composes with comm_edges: dist column matches the
    non-delta comm mode and deltas are norm-consistent."""
    spec = build_graph_spec(
        shared_graph, MAX_NODES - N_ROBOTS, N_ROBOTS, motion_radius=5.5 * 1.2,
        horizon=10,
    )
    bank = build_graph_bank([spec])
    env = CoverageEnv()
    params = CoverageParams(bank=bank, pos_delta=True, comm_edges=True)

    key = jax.random.key(2)
    state, obs = env.reset_env(key, params)
    edges = np.asarray(obs["edges"])
    senders = np.asarray(obs["senders"])
    assert edges.shape[1] == 3
    valid = senders != -1
    np.testing.assert_allclose(
        np.sqrt(edges[valid, 0] ** 2 + edges[valid, 1] ** 2),
        edges[valid, 2], rtol=1e-5, atol=1e-6,
    )

    state_n, obs_n = env.reset_env(key, params.replace(pos_delta=False))
    np.testing.assert_allclose(
        edges[:, 2], np.asarray(obs_n["edges"])[:, 0], atol=1e-6
    )

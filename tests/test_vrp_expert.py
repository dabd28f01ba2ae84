"""Native VRP expert: build, invariants, and quality vs the greedy expert."""
import numpy as np
import pytest

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

from gym_flock_tpu.experts.vrp import native_available, solve_vrp_raw


pytestmark = pytest.mark.skipif(
    not native_available(), reason="C++ toolchain unavailable"
)


def test_solver_respects_init_locations_and_budget():
    # 6 nodes + depot; simple line graph costs
    n = 7
    tm = np.abs(np.subtract.outer(np.arange(n), np.arange(n))).astype(float)
    tm[0, :] = 100000.0
    tm[:, 0] = 0.0
    init = np.array([1, 4], dtype=np.int32)
    tm[0, init] = 0.0
    pen = np.array([0, 0, 500, 500, 0, 500, 500], dtype=float)

    routes = solve_vrp_raw(tm, pen, init, max_route_time=6.0)
    assert len(routes) == 2
    # first stops are the init locations, one each
    firsts = {r[0] for r in routes if r}
    assert firsts == {1, 4}
    # budget respected
    for r in routes:
        t, prev = 0.0, 0
        for node in r:
            t += tm[prev, node]
            prev = node
        assert t <= 6.0 + 1e-9
    # all penalized nodes visited (they fit in budget)
    visited = set().union(*[set(r) for r in routes])
    assert {2, 3, 5, 6} <= visited


def test_solver_drops_unreachable_nodes():
    n = 4
    tm = np.full((n, n), 50.0)
    np.fill_diagonal(tm, 0.0)
    tm[0, :] = 100000.0
    tm[:, 0] = 0.0
    init = np.array([1], dtype=np.int32)
    tm[0, 1] = 0.0
    pen = np.array([0, 0, 500, 500], dtype=float)
    routes = solve_vrp_raw(tm, pen, init, max_route_time=10.0)
    # nothing but the start fits in budget 10 (arcs cost 50)
    assert routes[0] == [1]


def test_vrp_expert_beats_greedy_on_coverage():
    import gym_flock_tpu as gft
    from gym_flock_tpu.envs.coverage import (
        CoverageEnv,
        CoverageParams,
        default_coverage_bank,
    )
    from gym_flock_tpu.experts.coverage_vrp import CoverageVRPPolicy

    bank = default_coverage_bank(
        n_graphs=2, n_robots=6, max_nodes=500, horizon=-1, seed=0, kind="coverage"
    )
    env = CoverageEnv()
    params = CoverageParams(bank=bank)

    def episode(kind, seed):
        key = jax.random.key(seed)
        state, _ = env.reset_env(key, params)
        pol = CoverageVRPPolicy(params, horizon=-1)
        total = 0.0
        for _ in range(80):
            key, k1, k2 = jax.random.split(key, 3)
            if kind == "vrp":
                u = jnp.asarray(pol(state))
            else:
                u = env.controller(state, params, key=k1, greedy=True)
            state, _, r, d, _ = env.step_env(k2, state, u, params)
            total += float(r)
            if bool(d):
                break
        return total

    greedy = sum(episode("greedy", s) for s in range(2))
    vrp = sum(episode("vrp", s) for s in range(2))
    assert vrp >= greedy, f"VRP expert ({vrp}) should beat greedy ({greedy})"

"""Legacy gym-0.11-style surface: reset/step/controller/render/seed."""
import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

import gym_flock_tpu  # noqa: F401
from gym_flock_tpu.compat import FlattenDictWrapper, make_legacy


def test_flocking_legacy_loop():
    env = make_legacy("FlockingRelative-v0", n_agents=20)
    env.seed(0)
    obs = env.reset()
    assert obs[0].shape == (20, 6) and obs[1].shape == (20, 20)
    u = env.controller()
    obs, r, d, info = env.step(u)
    assert isinstance(r, float) and not d
    env.render()
    env.close()


def test_seed_determinism():
    env = make_legacy("FlockingRelative-v0", n_agents=15)
    env.seed(42)
    o1 = env.reset()
    env.seed(42)
    o2 = env.reset()
    np.testing.assert_array_equal(o1[0], o2[0])


def test_coverage_legacy_flatten_and_controllers():
    env = make_legacy("Coverage-v0", n_graphs=1)
    env.seed(0)
    wrapped = FlattenDictWrapper(env, dict_keys=env.keys)
    flat = wrapped.reset()
    # reference layout: nodes 500x3 + edges 2000x1 + senders + receivers + step
    assert flat.shape == (500 * 3 + 2000 * 3 + 1,)
    a = env.controller(random=True)
    assert a.shape == (6, 1)
    a = env.controller(random=False, greedy=True)
    flat, r, d, _ = wrapped.step(a)
    assert isinstance(r, float)
    env.close()


def test_coverage_legacy_vrp_expert_runs():
    env = make_legacy("Coverage-v0", n_graphs=1)
    env.seed(1)
    env.reset()
    total = 0.0
    for _ in range(5):
        a = env.controller(random=False, greedy=False)
        _, r, d, _ = env.step(a)
        total += r
    assert total >= 0


def test_params_from_cfg():
    env = make_legacy("FlockingRelative-v0")
    env.params_from_cfg({"comm_radius": "1.5", "n_agents": "40", "v_max": "3.0", "dt": "0.05"})
    assert env.params.comm_radius == 1.5
    assert env.params.n_agents == 40
    assert env.params.v_max == 3.0
    obs = env.reset()
    assert obs[0].shape == (40, 6)


def test_update_state_snaps_to_graph():
    env = make_legacy("Coverage-v0", n_graphs=1)
    env.seed(2)
    env.reset()
    g = int(env.state.graph)
    pos = np.asarray(env.params.bank["target_pos"][g])
    mask = np.asarray(env.params.bank["target_mask"][g])
    # place robots near specific nodes; update_state should snap to them
    idx = np.where(mask)[0][:6]
    noisy = pos[idx] + 0.3
    env.update_state(noisy)
    np.testing.assert_array_equal(np.asarray(env.state.robot_loc), idx)


def test_formations_parity_with_reference():
    from tests.reference_oracle import reference_available, load_reference

    if not reference_available():
        pytest.skip("no reference")
    load_reference()
    from gym_flock.envs.flocking.utils import circle as ref_circle  # type: ignore
    from gym_flock.envs.flocking.utils import grid as ref_grid  # type: ignore
    from gym_flock.envs.flocking.utils import twoflocks as ref_two  # type: ignore

    from gym_flock_tpu.utils import circle, grid, twoflocks

    for n in (12, 50):
        a, b = circle(n)
        ra, rb = ref_circle(n)
        np.testing.assert_allclose(a, ra)
        np.testing.assert_allclose(b, rb)
    np.testing.assert_allclose(grid(25), ref_grid(25))
    a, b = twoflocks(30)
    ra, rb = ref_two(30)
    np.testing.assert_allclose(a, ra)
    np.testing.assert_allclose(b, rb)


def test_frame_writer(tmp_path):
    import os
    from gym_flock_tpu.render.plot import FrameWriter, get_renderer

    env = make_legacy("FlockingRelative-v0", n_agents=10)
    env.seed(0)
    env.reset()
    writer = FrameWriter(
        get_renderer("FlockingRelative-v0", env.env, env.params), str(tmp_path)
    )
    for _ in range(3):
        env.step(env.controller())
        writer.capture(env.state)
    frames = sorted(os.listdir(tmp_path))
    assert frames == ["frame_0000.png", "frame_0001.png", "frame_0002.png"]
    writer.renderer.close()

# -- speculative controller+step fusion (compat/gym_api.py) -----------------


def _flat_eq(a, b):
    fa, _ = __import__("jax").tree.flatten(a)
    fb, _ = __import__("jax").tree.flatten(b)
    assert len(fa) == len(fb)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_flocking_speculation_matches_unfused():
    """controller()+step(u) (speculation hit) must be bit-identical to the
    plain step path (speculation discarded), including the RNG stream."""
    a = make_legacy("FlockingRelative-v0", n_agents=12)
    b = make_legacy("FlockingRelative-v0", n_agents=12)
    a.seed(7), b.seed(7)
    a.reset(), b.reset()
    for _ in range(3):
        ua = a.controller()
        ub = b.controller()
        np.testing.assert_array_equal(ua, ub)
        b._flush_queue()  # force the unfused path on b
        oa, ra, da, _ = a.step(ua)
        ob, rb, db, _ = b.step(ub)
        _flat_eq(oa, ob)
        assert ra == rb and da == db
    _flat_eq(a._state, b._state)
    import jax
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(a._key)),
        np.asarray(jax.random.key_data(b._key)),
    )


def test_coverage_speculation_matches_unfused():
    a = make_legacy("Coverage-v0", n_graphs=1)
    b = make_legacy("Coverage-v0", n_graphs=1)
    a.seed(3), b.seed(3)
    a.reset(), b.reset()
    for _ in range(5):
        ua = a.controller(greedy=True)
        ub = b.controller(greedy=True)
        np.testing.assert_array_equal(ua, ub)
        b._flush_queue()
        oa, ra, da, _ = a.step(ua)
        ob, rb, db, _ = b.step(ub)
        _flat_eq(oa, ob)
        assert ra == rb and da == db
    _flat_eq(a._state, b._state)
    import jax
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(a._key)),
        np.asarray(jax.random.key_data(b._key)),
    )


def test_speculation_miss_on_different_action():
    """step() with an action other than controller()'s must ignore the
    stash and behave exactly like a step with no controller() call."""
    a = make_legacy("FlockingRelative-v0", n_agents=12)
    b = make_legacy("FlockingRelative-v0", n_agents=12)
    a.seed(11), b.seed(11)
    a.reset(), b.reset()
    other = np.full((12, 2), 0.25)
    a.controller()  # stash a speculative transition, then discard it
    oa, ra, da, _ = a.step(other)
    ob, rb, db, _ = b.step(other)  # b never called controller()
    _flat_eq(oa, ob)
    assert ra == rb and da == db
    _flat_eq(a._state, b._state)


def test_speculation_survives_user_mutation_of_action():
    """Mutating the returned action array then stepping with it must be a
    miss (correct transition for the mutated action), not a stale hit."""
    a = make_legacy("FlockingRelative-v0", n_agents=12)
    b = make_legacy("FlockingRelative-v0", n_agents=12)
    a.seed(5), b.seed(5)
    a.reset(), b.reset()
    u = a.controller()
    u[:] = 0.125  # user mutates in place
    oa, ra, _, _ = a.step(u)
    ob, rb, _, _ = b.step(np.full_like(u, 0.125))
    _flat_eq(oa, ob)
    assert ra == rb


def test_coverage_renderer_overlay_artists(tmp_path):
    """The frontier (hide_nodes) and horizon-neighborhood overlays exist
    and update without error (reference coverage.py:434-508 line4/line5)."""
    import matplotlib

    matplotlib.use("Agg")
    import jax
    import numpy as np

    import gym_flock_tpu as gft
    from gym_flock_tpu.render.plot import CoverageRenderer

    env, params = gft.make("ExploreEnv-v0", n_graphs=1)
    state, _ = env.reset_env(jax.random.key(0), params)
    r = CoverageRenderer(env, params, horizon=5)
    r.draw(state)
    assert r.l_front is not None and r.l_horizon is not None
    # horizon overlay populated (robot 0's neighborhood is non-empty: it
    # contains at least its own node at cost 0)
    assert len(r.l_horizon.get_xdata()) >= 1
    u = env.controller(state, params, key=jax.random.key(1), greedy=True)
    state, _, _, _, _ = env.step_env(jax.random.key(2), state, u, params)
    r.draw(state)
    # frontier overlay is a valid artist with finite data
    assert np.all(np.isfinite(np.asarray(r.l_front.get_xdata(), dtype=float)))
    r.close()


def test_run_shepherding_example_smoke():
    """examples/run_shepherding.py (reference shepherding/test.py mirror)
    runs an episode loop end to end."""
    import subprocess
    import sys
    from pathlib import Path

    script = Path(__file__).parent.parent / "examples" / "run_shepherding.py"
    out = subprocess.run(
        [sys.executable, str(script), "--cpu", "-N", "1", "--steps", "3"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip()  # printed an episode reward


def test_coverage_k_speculation_matches_unfused_stream():
    """K-deep speculative pipelining is invisible: a 24-step greedy loop
    produces the same obs/rewards/dones AND the same RNG stream as a
    fresh env driven with speculation disabled (depth forced to 1 with an
    immediate miss each step)."""
    import numpy as np

    from gym_flock_tpu.compat import make_legacy

    env_a = make_legacy("Coverage-v0", n_graphs=1)
    env_a.seed(3)
    env_a.reset()

    env_b = make_legacy("Coverage-v0", n_graphs=1)
    env_b.seed(3)
    env_b.reset()

    traj_a, traj_b = [], []
    for t in range(24):
        u_a = env_a.controller(greedy=True)
        obs_a, r_a, d_a, _ = env_a.step(u_a)
        traj_a.append((obs_a["nodes"].copy(), r_a, d_a))

        u_b = env_b.controller(greedy=True)
        env_b._flush_queue()  # force the unfused fallback path
        obs_b, r_b, d_b, _ = env_b.step(u_b)
        traj_b.append((obs_b["nodes"].copy(), r_b, d_b))
        np.testing.assert_array_equal(u_a, u_b)

    for (na, ra, da), (nb, rb, db) in zip(traj_a, traj_b):
        np.testing.assert_array_equal(na, nb)
        assert ra == rb and da == db
    # streams identical afterwards
    np.testing.assert_array_equal(
        np.asarray(env_a.controller(greedy=True)),
        np.asarray(env_b.controller(greedy=True)),
    )


def test_coverage_k_speculation_mid_run_miss():
    """A perturbed action mid-run (speculation miss) commits the correct
    transition and RNG stream."""
    import numpy as np

    from gym_flock_tpu.compat import make_legacy

    env_a = make_legacy("Coverage-v0", n_graphs=1)
    env_a.seed(5)
    env_a.reset()
    env_b = make_legacy("Coverage-v0", n_graphs=1)
    env_b.seed(5)
    env_b.reset()

    for t in range(10):
        u_a = env_a.controller(greedy=True)
        u_b = env_b.controller(greedy=True)
        env_b._flush_queue()
        if t == 4:  # perturb: guaranteed miss on env_a's queue
            u_a = (np.asarray(u_a) + 1) % 4
            u_b = u_a.copy()
        obs_a, r_a, d_a, _ = env_a.step(u_a)
        obs_b, r_b, d_b, _ = env_b.step(u_b)
        np.testing.assert_array_equal(obs_a["nodes"], obs_b["nodes"])
        assert r_a == r_b and d_a == d_b


def test_coverage_k_speculation_double_controller_and_direct_step():
    """Doubled controller() calls and direct step() without controller()
    keep the stream consistent with the unfused env."""
    import numpy as np

    from gym_flock_tpu.compat import make_legacy

    env_a = make_legacy("Coverage-v0", n_graphs=1)
    env_a.seed(7)
    env_a.reset()
    env_b = make_legacy("Coverage-v0", n_graphs=1)
    env_b.seed(7)
    env_b.reset()

    # warm a deep queue on env_a
    for _ in range(3):
        u = env_a.controller(greedy=True)
        env_a.step(u)
        ub = env_b.controller(greedy=True)
        env_b._flush_queue()
        env_b.step(ub)

    # doubled controller call
    _ = env_a.controller(greedy=True)
    u_a = env_a.controller(greedy=True)
    _ = env_b.controller(greedy=True)
    env_b._flush_queue()
    u_b = env_b.controller(greedy=True)
    env_b._flush_queue()
    np.testing.assert_array_equal(u_a, u_b)
    oa, ra, da, _ = env_a.step(u_a)
    ob, rb, db, _ = env_b.step(u_b)
    np.testing.assert_array_equal(oa["nodes"], ob["nodes"])

    # direct step without controller (queue present on env_a after a hit run)
    u = env_a.controller(greedy=True)
    env_a.step(u)  # hit -> queue has remaining entries, head un-served
    ub = env_b.controller(greedy=True)
    env_b._flush_queue()
    env_b.step(ub)
    act = np.zeros((6, 1), dtype=np.int32)
    oa, ra, da, _ = env_a.step(act)
    ob, rb, db, _ = env_b.step(act)
    np.testing.assert_array_equal(oa["nodes"], ob["nodes"])
    assert ra == rb and da == db


def test_flocking_k_speculation_long_run_stream_equality():
    """Base-class K-deep pipelining over 20 steps: same trajectory and RNG
    stream as the unfused loop; repeated controller() calls re-serve the
    (pure) head action."""
    import jax

    a = make_legacy("FlockingRelative-v0", n_agents=12)
    b = make_legacy("FlockingRelative-v0", n_agents=12)
    a.seed(11), b.seed(11)
    a.reset(), b.reset()
    for t in range(20):
        ua = a.controller()
        if t == 5:  # doubled controller call: pure, must re-serve same u
            np.testing.assert_array_equal(ua, a.controller())
        ub = b.controller()
        b._flush_queue()
        np.testing.assert_array_equal(ua, ub)
        if t == 12:  # perturbed action: miss falls back identically
            ua = np.asarray(ua) + 0.125
            ub = ua.copy()
        oa, ra, da, _ = a.step(ua)
        ob, rb, db, _ = b.step(ub)
        _flat_eq(oa, ob)
        assert ra == rb and da == db
    _flat_eq(a._state, b._state)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(a._key)),
        np.asarray(jax.random.key_data(b._key)),
    )


def test_k_speculation_depth_respects_byte_budget():
    """Large observations automatically get shallow queues (the deep depth
    is sized against the host-byte budget)."""
    env = make_legacy("FlockingRelative-v0", n_agents=12)
    env.seed(0); env.reset()
    u = env.controller(); env.step(u)  # first hit -> streak
    u = env.controller(); env.step(u)  # deep queue built
    small_depth = env._deep_depth
    assert small_depth == env._SPEC_DEPTH_MAX  # tiny obs -> full depth

    big = make_legacy("FlockingRelative-v0", n_agents=600)
    big.seed(0); big.reset()
    u = big.controller(); big.step(u)
    u = big.controller(); big.step(u)
    # [600, 600] network per entry (~1.4 MB) against the 8 MB budget
    assert 1 <= big._deep_depth < big._SPEC_DEPTH_MAX


@pytest.mark.parametrize("env_id,kwargs", [
    ("FlockingRelative-v0", {"n_agents": 10}),
    ("Coverage-v0", {"n_graphs": 1}),
])
def test_k_speculation_randomized_differential(env_id, kwargs):
    """Randomized 120-event interleaving of controller/step/perturbed-step/
    doubled-controller/reset against a speculation-disabled twin: every
    observation, reward, done, and the final RNG stream must match."""
    import jax

    rng = np.random.RandomState(0)
    a = make_legacy(env_id, **kwargs)
    b = make_legacy(env_id, **kwargs)
    a.seed(9), b.seed(9)
    a.reset(), b.reset()
    is_cov = env_id.startswith("Coverage")

    def ctrl(e):
        return e.controller(greedy=True) if is_cov else e.controller()

    pending = None
    for i in range(120):
        ev = rng.choice(["pair", "double", "miss", "reset"], p=[0.6, 0.15, 0.15, 0.1])
        if ev == "reset":
            oa, ob = a.reset(), b.reset()
            _flat_eq(oa, ob)
            continue
        ua = ctrl(a)
        ub = ctrl(b)
        b._flush_queue()
        np.testing.assert_array_equal(np.asarray(ua), np.asarray(ub))
        if ev == "double":
            ua2 = ctrl(a)
            ub2 = ctrl(b)
            b._flush_queue()
            np.testing.assert_array_equal(np.asarray(ua2), np.asarray(ub2))
            ua, ub = ua2, ub2
        if ev == "miss":
            if is_cov:
                ua = (np.asarray(ua) + 1) % 4
            else:
                ua = np.asarray(ua) + 0.25
            ub = np.array(ua)
        oa, ra, da, _ = a.step(ua)
        ob, rb, db, _ = b.step(ub)
        _flat_eq(oa, ob)
        assert ra == rb and da == db, (i, ev, ra, rb)
        if da:
            a.reset(), b.reset()
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(a._key)),
        np.asarray(jax.random.key_data(b._key)),
    )


def test_coverage_autoreset_speculation_crosses_episode_boundary():
    """The fused lookahead continues across done into the next episode
    (in-scan autoreset): the whole controller/step/reset stream over 2+
    episode boundaries must be bit-identical to the unfused path, and the
    queue must survive the boundary."""
    import jax

    a = make_legacy("Coverage-v0", n_graphs=1)
    b = make_legacy("Coverage-v0", n_graphs=1)
    a.seed(5), b.seed(5)
    oa, ob = a.reset(), b.reset()
    _flat_eq(oa, ob)
    a._streak = True  # engage the deep pipeline immediately
    boundaries = 0
    for _ in range(200):
        ua = a.controller(greedy=True)
        ub = b.controller(greedy=True)
        np.testing.assert_array_equal(ua, ub)
        b._flush_queue()  # force the unfused path on b every step
        oa, ra, da, _ = a.step(ua)
        ob, rb, db, _ = b.step(ub)
        _flat_eq(oa, ob)
        assert ra == rb and da == db
        if da:
            boundaries += 1
            queue_before = len(a._queue)
            oa2, ob2 = a.reset(), b.reset()
            _flat_eq(oa2, ob2)
            if queue_before:
                # the pipeline must survive the boundary, not flush
                assert len(a._queue) == queue_before
            if boundaries >= 2:
                break
    assert boundaries >= 2, "workload never crossed an episode boundary"
    _flat_eq(a._state, b._state)
    np.testing.assert_array_equal(
        np.asarray(jax.random.key_data(a._key)),
        np.asarray(jax.random.key_data(b._key)),
    )


def test_coverage_step_past_done_without_reset_matches_unfused():
    """A driver that ignores done and keeps stepping must see exactly the
    unfused stream: the staged autoreset continuation is discarded."""
    a = make_legacy("Coverage-v0", n_graphs=1)
    b = make_legacy("Coverage-v0", n_graphs=1)
    a.seed(9), b.seed(9)
    a.reset(), b.reset()
    a._streak = True
    done_seen = False
    for _ in range(120):
        ua = a.controller(greedy=True)
        ub = b.controller(greedy=True)
        np.testing.assert_array_equal(ua, ub)
        b._flush_queue()
        oa, ra, da, _ = a.step(ua)
        ob, rb, db, _ = b.step(ub)
        _flat_eq(oa, ob)
        assert ra == rb and da == db
        if da:
            done_seen = True  # do NOT reset; keep stepping on both
    assert done_seen
    _flat_eq(a._state, b._state)


def test_coverage_controller_after_done_without_reset_matches_unfused():
    """controller() right after a done commit (no reset) recomputes from
    the committed done state instead of serving the post-reset queue."""
    a = make_legacy("Coverage-v0", n_graphs=1)
    b = make_legacy("Coverage-v0", n_graphs=1)
    a.seed(13), b.seed(13)
    a.reset(), b.reset()
    a._streak = True
    for _ in range(120):
        ua = a.controller(greedy=True)
        ub = b.controller(greedy=True)
        np.testing.assert_array_equal(ua, ub)
        b._flush_queue()
        oa, ra, da, _ = a.step(ua)
        ob, rb, db, _ = b.step(ub)
        assert ra == rb and da == db
        if da:
            break
    # no reset: the next controller must ignore the staged continuation
    ua = a.controller(greedy=True)
    ub = b.controller(greedy=True)
    np.testing.assert_array_equal(ua, ub)
    oa, ra, da, _ = a.step(ua)
    ob, rb, db, _ = b.step(ub)
    _flat_eq(oa, ob)
    assert ra == rb and da == db


def test_strict_expert_raises_on_infeasible_solution(monkeypatch):
    """strict=True reproduces the reference's decode asserts
    (vrp_solver.py:144-146): an empty or mis-assigned route raises
    AssertionError instead of degrading to greedy."""
    import gym_flock_tpu.experts.coverage_vrp as cv

    env = make_legacy("Coverage-v0", n_graphs=1)
    env.seed(0)
    env.reset()

    # sanity: the real solver is feasible here -> no raise
    u = env.controller(random=False, greedy=False, strict=True)
    assert u.shape == (env.params.n_robots, 1)

    def starved(tm, pen, init, budget, mode="or_default", **kw):
        routes = [[int(i)] for i in init]
        routes[-1] = []  # vehicle with no route: reference assert fires
        return routes

    monkeypatch.setattr(cv, "solve_vrp_raw", starved)
    env2 = make_legacy("Coverage-v0", n_graphs=1)
    env2.seed(0)
    env2.reset()
    with pytest.raises(AssertionError):
        env2.controller(random=False, greedy=False, strict=True)
    # non-strict mode tolerates the same solution (robustness fallback)
    env3 = make_legacy("Coverage-v0", n_graphs=1)
    env3.seed(0)
    env3.reset()
    u3 = env3.controller(random=False, greedy=False)
    assert u3.shape == (env3.params.n_robots, 1)


def test_cli_strict_expert_flag_smoke():
    """examples/run_coverage.py --strict-expert completes an episode with
    the restart-on-AssertionError loop (reference test.py:53-59)."""
    import subprocess
    import sys
    from pathlib import Path

    root = Path(__file__).parent.parent
    out = subprocess.run(
        [sys.executable, str(root / "examples" / "run_coverage.py"),
         "-e", "--strict-expert", "-n", "1", "--cpu"],
        capture_output=True, text=True, timeout=420, cwd=str(root),
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "Expert" in out.stdout
    assert "Reward over 1 episodes" in out.stdout

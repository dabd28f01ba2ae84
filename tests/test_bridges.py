"""Bridge adapters driven against a fake AirSim client / fake ROS services."""
import numpy as np
import pytest

import gym_flock_tpu  # noqa: F401
from gym_flock_tpu.bridges import (
    AirsimCoverageBridge,
    AirsimFlockingBridge,
    RosCoverageDriver,
    quaternion_to_yaw,
)


class _Future:
    def join(self):
        pass


class _Vec:
    def __init__(self, x=0.0, y=0.0, z=0.0):
        self.x_val, self.y_val, self.z_val = x, y, z


class _Quat:
    def __init__(self, w=1.0, x=0.0, y=0.0, z=0.0):
        self.w_val, self.x_val, self.y_val, self.z_val = w, x, y, z


class FakeMultirotorClient:
    """Minimal AirSim-compatible physics stub: velocity commands integrate,
    position commands teleport."""

    def __init__(self, names):
        self.pos = {n: np.zeros(2) for n in names}
        self.vel = {n: np.zeros(2) for n in names}
        self.calls = []

    def reset(self):
        self.calls.append("reset")

    def enableApiControl(self, flag, name):
        self.calls.append(("api", name))

    def armDisarm(self, flag, name):
        self.calls.append(("arm", name))

    def takeoffAsync(self, vehicle_name):
        return _Future()

    def moveToPositionAsync(self, x, y, z, speed, vehicle_name):
        self.pos[vehicle_name] = np.array([x, y])
        return _Future()

    def moveByVelocityZAsync(self, vx, vy, z, duration, vehicle_name):
        self.vel[vehicle_name] = np.array([vx, vy])
        self.pos[vehicle_name] = self.pos[vehicle_name] + duration * self.vel[vehicle_name]
        return _Future()

    def moveByAngleZAsync(self, pitch, roll, z, yaw, duration, vehicle_name):
        # crude accel model: tilt -> accel -> velocity
        accel = 9.8 * np.array([-pitch, roll])
        self.vel[vehicle_name] = self.vel[vehicle_name] + accel * duration * 10
        self.pos[vehicle_name] = self.pos[vehicle_name] + self.vel[vehicle_name] * duration * 10
        return _Future()

    def getMultirotorState(self, vehicle_name):
        class S:
            pass

        s = S()
        s.kinematics_estimated = S()
        s.kinematics_estimated.position = _Vec(*self.pos[vehicle_name], 0.0)
        s.kinematics_estimated.linear_velocity = _Vec(*self.vel[vehicle_name], 0.0)
        s.kinematics_estimated.orientation = _Quat()
        return s


def test_quaternion_to_yaw():
    assert quaternion_to_yaw(_Quat(1, 0, 0, 0)) == 0.0
    # 90-degree z rotation
    q = _Quat(np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4))
    np.testing.assert_allclose(quaternion_to_yaw(q), np.pi / 2, atol=1e-12)


def test_airsim_flocking_bridge_loop():
    names = [f"Drone{i}" for i in range(10)]
    home = np.zeros((10, 3))
    client = FakeMultirotorClient(names)
    bridge = AirsimFlockingBridge(client, names=names, home=home)

    obs = bridge.reset(np.random.RandomState(0))
    assert obs[0].shape == (10, 6)
    for _ in range(3):
        u = bridge.controller()
        (values, net), r, d, _ = bridge.step(u)
        assert np.isfinite(r)
    assert "reset" in client.calls


def test_airsim_coverage_bridge_loop():
    from gym_flock_tpu.compat import make_legacy

    env = make_legacy("Coverage-v0", n_graphs=1)
    env.seed(0)
    names = [f"Drone{i}" for i in range(6)]
    client = FakeMultirotorClient(names)
    bridge = AirsimCoverageBridge(client, env, names=names, home=np.zeros((6, 3)))
    obs = bridge.reset()
    assert "nodes" in obs
    a = env.controller(random=False, greedy=True)
    obs, r, d, _ = bridge.step(a)
    assert np.isfinite(r)


def test_ros_driver_tick():
    from gym_flock_tpu.compat import make_legacy

    env = make_legacy("Coverage-v0", n_graphs=1)
    env.seed(1)
    env.reset()
    g = int(env.state.graph)
    pos = np.asarray(env.params.bank["target_pos"][g])
    cur = np.asarray(env.state.robot_loc)

    sent = []
    driver = RosCoverageDriver(
        env,
        get_poses=lambda: pos[cur] + 0.1,
        send_goal=[lambda goal, i=i: sent.append((i, goal)) for i in range(6)],
    )
    r, done = driver.tick()
    assert np.isfinite(r)
    assert done in (False, True)
    assert len(sent) == 6
    # waypoints are graph nodes
    for _, goal in sent:
        d = np.linalg.norm(pos - goal[:2], axis=1)
        assert d.min() < 1e-6


def test_airsim_env_ids_registered():
    import gym_flock_tpu as gft

    with pytest.raises(ValueError, match="AirSim-compatible client"):
        gft.make("FlockingAirsimAccel-v0")

    # the reference settings.json ships 5 drones (grid() now accepts any n)
    names = [f"D{i}" for i in range(5)]
    bridge, params = gft.make(
        "FlockingAirsimAccel-v0",
        client=FakeMultirotorClient(names),
        names=names,
        home=np.zeros((5, 3)),
    )
    obs = bridge.reset(np.random.RandomState(0))
    assert obs[0].shape == (5, 6)

    names6 = [f"D{i}" for i in range(6)]
    env2, _ = gft.make(
        "MappingAirsim-v0",
        client=FakeMultirotorClient(names6),
        names=names6,
        home=np.zeros((6, 3)),
        n_graphs=1,
    )
    obs = env2.reset()
    assert "nodes" in obs


def test_grid_formation_any_fleet_size():
    """grid() stays byte-identical to the reference for n % side == 0 and
    no longer crashes otherwise (the reference does, utils.py:29): the
    enclosing grid's first n points, still 0.8-spaced and distinct."""
    from gym_flock_tpu.utils.formations import grid

    g10 = grid(10)
    assert g10.shape == (10, 2)
    for n in (1, 2, 3, 6, 7, 11):
        g = grid(n)
        assert g.shape == (n, 2)
        d = np.linalg.norm(g[:, None] - g[None, :], axis=-1)
        assert (d[~np.eye(n, dtype=bool)] > 0.7).all() if n > 1 else True
    # multiple-of-side case unchanged: first row of grid(10) == grid(10)
    np.testing.assert_array_equal(grid(10), g10)


def test_parse_settings_pretty_printed(tmp_path):
    """The reference regex needs X/Y/Z on one line; pretty-printed AirSim
    settings (the docs' format) fall back to a real JSON parse with the
    same names/homes."""
    import json

    from gym_flock_tpu.utils.formations import parse_settings

    cfg = {
        "Vehicles": {
            "A": {"X": 0, "Y": 1, "Z": -2},
            "B": {"X": 3.5, "Y": -1, "Z": 0},
        }
    }
    p = tmp_path / "settings.json"
    p.write_text(json.dumps(cfg, indent=4))  # one coordinate per line
    names, homes = parse_settings(str(p))
    assert names == ["A", "B"]
    np.testing.assert_array_equal(homes, [[0, 1, -2], [3.5, -1, 0]])


def test_bridge_vehicle_count_must_match_env():
    from gym_flock_tpu.bridges import AirsimCoverageBridge
    from gym_flock_tpu.compat import make_legacy

    env = make_legacy("Coverage-v0", n_graphs=1)  # 6 robots
    names = [f"D{i}" for i in range(4)]
    with pytest.raises(ValueError, match="4 vehicles"):
        AirsimCoverageBridge(
            FakeMultirotorClient(names), env, names=names, home=np.zeros((4, 3))
        )

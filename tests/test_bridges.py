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
    r = driver.tick()
    assert np.isfinite(r)
    assert len(sent) == 6
    # waypoints are graph nodes
    for _, goal in sent:
        d = np.linalg.norm(pos - goal[:2], axis=1)
        assert d.min() < 1e-6


def test_airsim_env_ids_registered():
    import gym_flock_tpu as gft

    with pytest.raises(ValueError, match="AirSim-compatible client"):
        gft.make("FlockingAirsimAccel-v0")

    # grid() formations need n >= 5 (reference settings.json ships 5 drones)
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

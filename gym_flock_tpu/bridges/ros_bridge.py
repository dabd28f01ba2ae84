"""ROS/Unity live driver — adapter over injected pose source and goto service.

Mirror of the reference's test_sim.py:33-133 control loop without importing
rospy at module level: poses stream in through a callable, waypoint commands
stream out through per-robot service callables, and the coverage env core in
between computes observations/rewards and the greedy expert.

Wire-up with real ROS:

    import rospy
    driver = RosCoverageDriver(
        env,                               # compat LegacyEnv over CoverageARL
        get_poses=lambda: pose_buffer.copy(),
        send_goal=[make_goto_service(i) for i in range(n_robots)],
    )
    while not rospy.is_shutdown():
        driver.tick()
        rate.sleep()
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import numpy as np

__all__ = ["RosCoverageDriver"]


class RosCoverageDriver:
    def __init__(
        self,
        legacy_env,
        get_poses: Callable[[], np.ndarray],
        send_goal: Sequence[Callable[[np.ndarray], None]],
        altitudes: Optional[Sequence[float]] = None,
    ):
        self.env = legacy_env
        self.get_poses = get_poses
        self.send_goal = list(send_goal)
        n = len(self.send_goal)
        n_robots = int(legacy_env.params.n_robots)
        if n != n_robots:
            raise ValueError(
                f"{n} goto services for an env with {n_robots} robots — "
                f"uncommanded or mis-snapped robots otherwise go unnoticed"
            )
        self.altitudes = list(altitudes) if altitudes is not None else [-40.0] * n
        self.total_reward = 0.0

    def tick(self):
        """One loop iteration (reference test_sim.py:94-133): ingest poses,
        compute reward, run the greedy expert, send each robot its next
        waypoint.  Returns ``(reward, done)`` — done fires on the single
        tick the episode ends (all targets covered or time ==
        episode_length), after which the caller should reset or stop."""
        env = self.env
        env.update_state(self.get_poses())

        # re-evaluate obs/reward at the new snapped state (the reference's
        # action=None step, coverage.py:180-202)
        obs, reward, done = env.observe()
        self.total_reward += reward

        # the legacy controller keeps its RNG stream identical to the
        # unfused call pair; its depth-1 fused program includes a step_env
        # whose result the next tick's flush discards — ~0.1 ms of device
        # work, negligible next to the per-robot RPC round-trips
        action = env.controller(random=False, greedy=True)

        g = int(env.state.graph)
        bank = env.params.bank
        pos = np.asarray(bank["target_pos"][g])
        nbr = np.asarray(bank["neighbor_table"][g])
        cur = np.asarray(env.state.robot_loc)
        nxt = nbr[cur, np.asarray(action).reshape(-1)]
        waypoints = pos[nxt]

        for i, service in enumerate(self.send_goal):
            goal = np.asarray(
                [waypoints[i, 0], waypoints[i, 1], self.altitudes[i], -1.57]
            )
            try:
                service(goal)
            except Exception:
                # mirror the reference's ServiceException swallow
                # (test_sim.py:125-127)
                pass
        return float(reward), bool(done)

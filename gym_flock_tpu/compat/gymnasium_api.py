"""Modern Gymnasium (0.26+) API facade over the legacy surface.

The reference targets gym 0.11 — registrations with 4-tuple ``step`` and a
bare ``reset()`` (reference gym_flock/__init__.py:3-112; setup.py deps:
gym/numpy/matplotlib).  Users migrating from the reference today mostly
drive the *Gymnasium* API instead::

    env = make_gymnasium("FlockingRelative-v0")
    obs, info = env.reset(seed=0)
    u = env.controller()
    obs, reward, terminated, truncated, info = env.step(u)

This module provides that surface without depending on the ``gymnasium``
package: it wraps :class:`~gym_flock_tpu.compat.gym_api.LegacyEnv` (which
owns the speculative controller/step pipelining, so the modern facade gets
the same single-stream throughput) and adds the episode-boundary split the
modern API requires:

* ``terminated`` — the env's own done flag (MDP-terminal: e.g. coverage
  all-targets-visited or its in-env episode length, reference
  coverage.py:357);
* ``truncated`` — the registration-level ``max_episode_steps`` time limit
  (reference gym_flock/__init__.py), applied exactly like gymnasium's
  ``TimeLimit`` wrapper: a step counter outside the env.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from gym_flock_tpu.compat.gym_api import LegacyEnv, make_legacy
from gym_flock_tpu.core.registry import registry as _registry

__all__ = ["GymnasiumEnv", "make_gymnasium"]


class GymnasiumEnv:
    """``reset(seed=...) -> (obs, info)`` / 5-tuple ``step`` facade.

    Wraps a :class:`LegacyEnv`; the expert is still reachable as
    ``env.controller(...)`` and every other legacy attribute (``params``,
    ``params_from_cfg``, ``update_state``, ...) forwards through.
    """

    def __init__(
        self,
        legacy: LegacyEnv,
        max_episode_steps: Optional[int] = None,
        render_mode: Optional[str] = None,
    ):
        self._legacy = legacy
        self.max_episode_steps = max_episode_steps
        self.render_mode = render_mode
        self._elapsed = 0
        self._needs_reset = True

    # -- gymnasium core surface -------------------------------------------

    def reset(
        self, *, seed: Optional[int] = None, options: Optional[Dict] = None
    ) -> Tuple[Any, Dict]:
        if seed is not None:
            self._legacy.seed(seed)
        obs = self._legacy.reset()
        self._elapsed = 0
        self._needs_reset = False
        if self.render_mode == "human":
            self._legacy.render()
        return obs, {}

    def step(self, action) -> Tuple[Any, float, bool, bool, Dict]:
        assert not self._needs_reset, (
            "episode is over (terminated or truncated) — call reset() first"
        )
        obs, reward, done, info = self._legacy.step(action)
        self._elapsed += 1
        terminated = bool(done)
        truncated = bool(
            self.max_episode_steps is not None
            and self._elapsed >= self.max_episode_steps
        )
        if terminated or truncated:
            self._needs_reset = True
        if self.render_mode == "human":
            self._legacy.render()
        return obs, float(reward), terminated, truncated, dict(info)

    def render(self):
        return self._legacy.render()

    def close(self):
        return self._legacy.close()

    # -- passthroughs -------------------------------------------------------

    @property
    def unwrapped(self) -> LegacyEnv:
        return self._legacy

    @property
    def action_space(self):
        return self._legacy.action_space

    @property
    def observation_space(self):
        return self._legacy.observation_space

    @property
    def np_random(self) -> np.random.RandomState:
        return self._legacy.np_random

    def controller(self, *args, **kwargs):
        """Expert action (the reference's non-standard surface, kept)."""
        return self._legacy.controller(*args, **kwargs)

    def __getattr__(self, name):
        # fall through to the legacy facade for everything else
        # (params, params_from_cfg, update_state, observe, env_id, ...)
        return getattr(self._legacy, name)


def make_gymnasium(
    env_id: str,
    max_episode_steps: Optional[int] = None,
    render_mode: Optional[str] = None,
    **kwargs,
) -> GymnasiumEnv:
    """``gymnasium.make``-style construction.

    ``max_episode_steps`` defaults to the registered limit (the reference's
    ``register(..., max_episode_steps=...)`` values, preserved in
    ``core.registry``); pass an int to override or ``0`` to disable the
    time limit entirely.
    """
    legacy = make_legacy(env_id, **kwargs)
    if max_episode_steps is None:
        spec = _registry.get(env_id)
        max_episode_steps = spec.max_episode_steps if spec is not None else None
    elif max_episode_steps == 0:
        max_episode_steps = None
    return GymnasiumEnv(legacy, max_episode_steps, render_mode)

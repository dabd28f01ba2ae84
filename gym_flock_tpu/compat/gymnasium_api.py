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
modern API requires.

Terminated/truncated semantics per env family
---------------------------------------------
The reference envs fall into three groups, and a faithful Gymnasium
migration must split their single ``done`` flag differently:

* **time-driven** (all flocking variants, shepherding, formation, LQR,
  FlockingMulti): the env's own ``done`` is purely ``time >= max_steps``
  — a time limit baked into the env (the reference versions always return
  ``done=False`` and rely on gym's ``TimeLimit``; e.g. reference
  flocking_relative.py:91-109 never sets done).  Surfacing it as
  ``terminated`` would break value bootstrapping, so here env-done maps to
  ``truncated`` and ``terminated`` is always ``False``.
* **mixed** (the legacy Mapping family): ``done`` is
  ``all-targets-observed OR time >= max_steps`` (reference
  old/mapping.py:160-170).  The all-observed component is MDP-terminal;
  the time component is truncation.  The two are split by comparing the
  elapsed step count against the env's own ``params.max_steps``.
* **terminal** (the coverage family): ``done`` is
  ``all-visited OR step == episode_length`` where the step counter is part
  of the *observation* (reference coverage.py:329, :357) — the time limit
  is genuinely Markov-terminal, so env-done maps to ``terminated``.

``truncated`` additionally fires from the registration-level
``max_episode_steps`` (reference gym_flock/__init__.py), applied exactly
like gymnasium's ``TimeLimit`` wrapper: a step counter outside the env.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import numpy as np

from gym_flock_tpu.compat.gym_api import LegacyEnv, make_legacy
from gym_flock_tpu.core.registry import registry as _registry

__all__ = ["GymnasiumEnv", "make_gymnasium"]


def _done_semantics(env_id: str) -> str:
    """Classify an env id's native done flag (see module docstring)."""
    if env_id == "MappingAirsim-v0" or env_id.startswith(("Coverage", "Explore")):
        return "terminal"
    if env_id.startswith("Mapping"):
        return "mixed"
    return "time"


class GymnasiumEnv:
    """``reset(seed=...) -> (obs, info)`` / 5-tuple ``step`` facade.

    Wraps a :class:`LegacyEnv`; the expert is still reachable as
    ``env.controller(...)`` and every other legacy attribute (``params``,
    ``params_from_cfg``, ``update_state``, ...) forwards through.

    Note: ``np_random`` is the legacy ``numpy.random.RandomState`` (the
    reference's gym-0.11 RNG type), not Gymnasium's
    ``numpy.random.Generator``.
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
        self._ever_seeded = False
        self._done_kind = _done_semantics(getattr(legacy, "env_id", "") or "")

    # -- gymnasium core surface -------------------------------------------

    def reset(
        self, *, seed: Optional[int] = None, options: Optional[Dict] = None
    ) -> Tuple[Any, Dict]:
        if seed is not None:
            self._legacy.seed(seed)
            self._ever_seeded = True
        elif not self._ever_seeded:
            # Gymnasium's unseeded default is fresh OS entropy; the legacy
            # facade would otherwise start every process at key(0) and
            # silently correlate parallel workers.
            self._legacy.seed(int(np.random.SeedSequence().entropy) & 0x7FFFFFFF)
            self._ever_seeded = True
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
        done = bool(done)
        limit_hit = bool(
            self.max_episode_steps is not None
            and self._elapsed >= self.max_episode_steps
        )
        if self._done_kind == "time":
            # env-done is a pure time limit -> truncation, never terminal
            terminated = False
            truncated = done or limit_hit
        elif self._done_kind == "mixed":
            env_limit = getattr(self._legacy.params, "max_steps", None)
            time_hit = env_limit is not None and self._elapsed >= int(env_limit)
            terminated = done and not time_hit
            truncated = (done and time_hit) or limit_hit
        else:  # "terminal": coverage — in-env step count is part of the obs
            terminated = done
            truncated = limit_hit
        if terminated or truncated:
            self._needs_reset = True
        if self.render_mode == "human":
            self._legacy.render()
        return obs, float(reward), terminated, truncated, dict(info)

    def render(self):
        if self.render_mode is None:
            return None
        return self._legacy.render(self.render_mode)

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
        # (params, params_from_cfg, update_state, observe, env_id, ...).
        # Private names never forward: copy/pickle reconstruct instances
        # without __init__, and a _legacy lookup here would recurse.
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(object.__getattribute__(self, "_legacy"), name)


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
    time limit entirely.  ``render_mode`` accepts ``None`` (render() is a
    no-op), ``"human"`` (interactive matplotlib, auto-rendered on
    reset/step like Gymnasium) or ``"rgb_array"`` (explicit ``render()``
    returns an HxWx3 uint8 frame).
    """
    legacy = make_legacy(env_id, **kwargs)
    if max_episode_steps is None:
        spec = _registry.get(env_id)
        max_episode_steps = spec.max_episode_steps if spec is not None else None
    elif max_episode_steps == 0:
        max_episode_steps = None
    return GymnasiumEnv(legacy, max_episode_steps, render_mode)

"""Import the reference implementation (/root/reference) as a test oracle.

The reference targets gym 0.11 + NumPy 1.x; neither is installed.  This
module installs a minimal in-memory ``gym`` stub (just enough API surface:
``gym.Env``, ``gym.spaces``, ``gym.utils.seeding.np_random``, registration)
and NumPy 1.x aliases (``np.Inf``/``np.bool``/``np.int``/``np.float``), then
imports ``gym_flock`` from the read-only reference checkout.

Parity tests inject identical initial states into both implementations and
compare trajectories; no reference code is copied into the framework.
"""
from __future__ import annotations

import sys
import types
from pathlib import Path

import numpy as np

REFERENCE_PATH = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE_PATH / "gym_flock").is_dir()


def _install_numpy_compat():
    if not hasattr(np, "Inf"):
        np.Inf = np.inf  # type: ignore[attr-defined]
    for alias, real in (("bool", bool), ("int", int), ("float", float)):
        if alias not in np.__dict__:
            setattr(np, alias, real)


def _install_gym_stub():
    if "gym" in sys.modules and getattr(sys.modules["gym"], "_gft_stub", False):
        return

    gym = types.ModuleType("gym")
    gym._gft_stub = True

    class Env:
        metadata = {}

        def seed(self, seed=None):
            return [seed]

        def close(self):
            pass

    gym.Env = Env

    spaces = types.ModuleType("gym.spaces")

    class Box:
        def __init__(self, low=None, high=None, shape=None, dtype=np.float32):
            self.low, self.high, self.shape, self.dtype = low, high, shape, dtype

    class Discrete:
        def __init__(self, n):
            self.n = n

    class MultiDiscrete:
        def __init__(self, nvec):
            self.nvec = nvec

    class Dict:
        def __init__(self, spaces_arg=None, **kwargs):
            if isinstance(spaces_arg, list):
                spaces_arg = dict(spaces_arg)
            self.spaces = spaces_arg or kwargs

    class Tuple:
        def __init__(self, spaces_arg):
            self.spaces = spaces_arg

    spaces.Box = Box
    spaces.Discrete = Discrete
    spaces.MultiDiscrete = MultiDiscrete
    spaces.Dict = Dict
    spaces.Tuple = Tuple
    gym.spaces = spaces
    gym.Space = object

    utils = types.ModuleType("gym.utils")
    seeding = types.ModuleType("gym.utils.seeding")

    def np_random(seed=None):
        # faithful to gym 0.11: sha512-hashed seed (see compat.parity)
        if seed is None:
            rng = np.random.RandomState()
        else:
            from gym_flock_tpu.compat.parity import gym011_np_random

            rng = gym011_np_random(seed)
        return rng, seed

    seeding.np_random = np_random
    utils.seeding = seeding
    gym.utils = utils
    gym.error = types.ModuleType("gym.error")
    gym.error.Error = RuntimeError

    registration = types.ModuleType("gym.envs.registration")
    _registry = {}

    def register(id=None, entry_point=None, max_episode_steps=None, **kw):
        _registry[id] = (entry_point, max_episode_steps)

    registration.register = register
    registration.registry = _registry
    envs_mod = types.ModuleType("gym.envs")
    envs_mod.registration = registration
    gym.envs = envs_mod

    def make(env_id):
        entry_point, _ = _registry[env_id]
        module, cls_name = entry_point.split(":")
        import importlib

        mod = importlib.import_module(module)
        return getattr(mod, cls_name)()

    gym.make = make

    sys.modules["gym"] = gym
    sys.modules["gym.spaces"] = spaces
    sys.modules["gym.utils"] = utils
    sys.modules["gym.utils.seeding"] = seeding
    sys.modules["gym.envs"] = envs_mod
    sys.modules["gym.envs.registration"] = registration
    sys.modules["gym.error"] = gym.error


_loaded = None


def load_reference():
    """Import and return the reference ``gym_flock`` package (cached)."""
    global _loaded
    if _loaded is not None:
        return _loaded
    assert reference_available(), "reference checkout not present"
    _install_numpy_compat()
    _install_gym_stub()
    import matplotlib

    matplotlib.use("Agg")
    if str(REFERENCE_PATH) not in sys.path:
        sys.path.insert(0, str(REFERENCE_PATH))
    import gym_flock  # noqa: F401

    _loaded = gym_flock
    return _loaded


def make_reference_env(env_id: str):
    """Instantiate a reference env class directly (bypasses gym.make)."""
    load_reference()
    import importlib

    table = {
        "FlockingRelative-v0": ("gym_flock.envs.flocking.flocking_relative", "FlockingRelativeEnv"),
        "Flocking-v0": ("gym_flock.envs.flocking.flocking", "FlockingEnv"),
        "FlockingLeader-v0": ("gym_flock.envs.flocking.flocking_leader", "FlockingLeaderEnv"),
        "FlockingObstacle-v0": ("gym_flock.envs.flocking.flocking_obstacle", "FlockingObstacleEnv"),
        "FlockingStochastic-v0": ("gym_flock.envs.flocking.flocking_stoch", "FlockingStochasticEnv"),
        "FlockingTwoFlocks-v0": ("gym_flock.envs.flocking.flocking_twoflocks", "FlockingTwoFlocksEnv"),
        "Coverage-v0": ("gym_flock.envs.spatial.coverage", "CoverageEnv"),
        "Shepherding-v0": ("gym_flock.envs.shepherding.shepherding", "ShepherdingEnv"),
        "FormationFlying-v0": ("gym_flock.envs.formation.formation_flying", "FormationFlyingEnv"),
    }
    module, cls = table[env_id]
    mod = importlib.import_module(module)
    return getattr(mod, cls)()

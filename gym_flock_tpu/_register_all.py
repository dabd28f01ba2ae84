"""Populate the registry with the reference-compatible env ids.

Mirrors the reference registrations and their ``max_episode_steps``
(reference gym_flock/__init__.py:3-112).  Coverage/shepherding/formation ids
are appended to this table as their families land.
"""
from __future__ import annotations

from gym_flock_tpu.core.registry import register
from gym_flock_tpu.envs.flocking import (
    FlockingAbsoluteEnv,
    FlockingLeaderEnv,
    FlockingObstacleEnv,
    FlockingParams,
    FlockingRelativeEnv,
    FlockingStochasticEnv,
    FlockingTwoFlocksEnv,
    LargeFlockingEnv,
    SparseFlockingEnv,
)


def _flocking_factory(cls):
    def factory(**kwargs):
        env = cls()
        params = env.default_params()
        if kwargs:
            params = params.replace(**kwargs)
        return env, params

    return factory


# id, class, max_episode_steps — per reference gym_flock/__init__.py
register("FlockingRelative-v0", _flocking_factory(FlockingRelativeEnv), 1000)
register("Flocking-v0", _flocking_factory(FlockingAbsoluteEnv), 1000)
register("FlockingLeader-v0", _flocking_factory(FlockingLeaderEnv), 200)
register("FlockingObstacle-v0", _flocking_factory(FlockingObstacleEnv), 200)
register("FlockingStochastic-v0", _flocking_factory(FlockingStochasticEnv), 500)
register("FlockingTwoFlocks-v0", _flocking_factory(FlockingTwoFlocksEnv), 500)
# extension: Pallas-backed large-swarm variant (no reference counterpart)
register("FlockingLarge-v0", _flocking_factory(LargeFlockingEnv), 1000)
register("FlockingSparse-v0", _flocking_factory(SparseFlockingEnv), 1000)


def _register_coverage():
    from gym_flock_tpu.envs.coverage import coverage_factory

    register("Coverage-v0", coverage_factory("coverage"), 75)
    register("CoverageARL-v0", coverage_factory("arl"), 100000)
    register("CoverageARL-v1", coverage_factory("arl"), 100000)
    register("CoverageFull-v0", coverage_factory("full"), 100000)
    register("ExploreEnv-v0", coverage_factory("explore"), 100000)
    register("ExploreEnv-v1", coverage_factory("explore"), 100000)
    register("ExploreFullEnv-v0", coverage_factory("explore_full"), 100000)


def _register_others():
    from gym_flock_tpu.envs.shepherding import shepherding_factory
    from gym_flock_tpu.envs.formation import formation_factory
    from gym_flock_tpu.envs.lqr import lqr_factory

    register("Shepherding-v0", shepherding_factory, 1000)
    register("FormationFlying-v0", formation_factory, 500)
    register("LQR-v0", lqr_factory, None)  # unregistered in reference (lqr.py:12)


def _register_legacy_mapping():
    """The reference's ``old/`` env family (SURVEY.md §2.2 #22) — never
    registered upstream (dead code, some of it unconstructible); ids here
    are this framework's."""
    from gym_flock_tpu.envs.flocking_multi import FlockingMultiEnv
    from gym_flock_tpu.envs.mapping import (
        MappingDiscEnv,
        MappingEnv,
        MappingLocalEnv,
        MappingVelEnv,
    )

    def _mapping_factory(cls):
        def factory(**kwargs):
            import jax.numpy as jnp

            from gym_flock_tpu.envs.mapping import make_target_grid

            env = cls()
            params = env.default_params()
            if kwargs:
                params = params.replace(**kwargs)
                if "n_agents" in kwargs and getattr(env, "_px_tracks_n", False):
                    # vel/disc/local arena scales with the fleet
                    # (reference old/mapping_vel.py:103-104)
                    n = float(params.n_agents)
                    params = params.replace(
                        px_max=kwargs.get("px_max", n),
                        py_max=kwargs.get("py_max", n),
                    )
                if "target_x" not in kwargs:
                    # the target lattice is derived from (n_agents, p[xy]_max)
                    # (reference old/mapping_vel.py:95-111)
                    params = params.replace(
                        target_x=jnp.asarray(
                            make_target_grid(
                                params.n_agents, params.px_max, params.py_max
                            )
                        )
                    )
            return env, params

        return factory

    register("Mapping-v0", _mapping_factory(MappingEnv), 1000)
    register("MappingVel-v0", _mapping_factory(MappingVelEnv), 1000)
    register("MappingDisc-v0", _mapping_factory(MappingDiscEnv), 1000)
    register("MappingLocal-v0", _mapping_factory(MappingLocalEnv), 1000)
    register("FlockingMulti-v0", _flocking_factory(FlockingMultiEnv), 1000)


def _airsim_factory(env_id):
    def factory(client=None, settings_path=None, names=None, home=None, **kwargs):
        """AirSim-bridged envs need a simulator client (reference gates these
        ids on `import airsim`, gym_flock/__init__.py:97-112; here the client
        is injected instead — see gym_flock_tpu.bridges)."""
        if client is None:
            raise ValueError(
                f"{env_id} requires an AirSim-compatible client: "
                f"make('{env_id}', client=..., settings_path=... | names=..., home=...). "
                "See gym_flock_tpu.bridges.airsim_bridge."
            )
        from gym_flock_tpu.bridges.airsim_bridge import (
            AirsimCoverageBridge,
            AirsimFlockingBridge,
        )

        if env_id == "FlockingAirsimAccel-v0":
            bridge = AirsimFlockingBridge(
                client, settings_path=settings_path, names=names, home=home
            )
            return bridge, bridge.params
        # MappingAirsim-v0: coverage graph MDP over AirSim drones.  (In the
        # reference this registration names a nonexistent class — a latent
        # bug, SURVEY.md §2.1; here it maps to the working coverage bridge.)
        from gym_flock_tpu.compat.gym_api import make_legacy

        legacy = make_legacy("Coverage-v0", **kwargs)
        bridge = AirsimCoverageBridge(
            client, legacy, settings_path=settings_path, names=names, home=home
        )
        return bridge, legacy.params

    return factory


# all dependencies (scipy for map building) are declared requirements, so
# failures here should surface, not be swallowed
_register_coverage()
_register_others()
_register_legacy_mapping()
register("FlockingAirsimAccel-v0", _airsim_factory("FlockingAirsimAccel-v0"), 200)
register("MappingAirsim-v0", _airsim_factory("MappingAirsim-v0"), 100000)

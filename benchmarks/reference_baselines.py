"""Measure the reference's single-stream rates for the four env families
that had no throughput baseline (VERDICT r3 next #1): Shepherding,
FormationFlying, LQR, and the legacy Mapping family.

Methodology identical to BASELINE.md's original rows: run the reference
code at /root/reference directly, one CPU process, gym stubbed to the 0.11
API (tests/reference_oracle.py), matplotlib Agg, no rendering; report the
best-of-N steady-state rate with resets excluded from the timed loop.

Loops measured (reference file:line):
  * Shepherding-v0:    controller() + step(u)   shepherding.py:80-117 + :204-233
  * FormationFlying-v0: step(u) only (the env has NO controller();
                        actions come from an external learner)
                        formation_flying.py:70-79
  * LQREnv (unregistered): step(u) only (controller() at lqr.py:106-107
                        literally `return`s None — no expert exists)
                        lqr.py:81-97
  * Mapping (old/mapping.py): controller() + step(u)  :139-165 + :224-232

Prints one JSON object with steps/s per family.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np

from tests.reference_oracle import load_reference


def best_of(loop, n_steps, reps=5):
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        loop(n_steps)
        best = max(best, n_steps / (time.perf_counter() - t0))
    return best


def bench_shepherding(n_steps=400):
    from gym_flock.envs.shepherding.shepherding import ShepherdingEnv

    env = ShepherdingEnv()
    env.seed(0)
    env.reset()

    def loop(n):
        for _ in range(n):
            u = env.controller()
            env.step(u)

    loop(20)  # warm
    return best_of(loop, n_steps)


def bench_formation(n_steps=2000):
    from gym_flock.envs.formation.formation_flying import FormationFlyingEnv

    env = FormationFlyingEnv()
    env.seed(0)
    env.reset()
    rng = np.random.RandomState(1)
    u = rng.uniform(-1, 1, size=(env.n_agents, env.nu))

    def loop(n):
        for _ in range(n):
            env.step(u)

    loop(50)
    return best_of(loop, n_steps)


def bench_lqr(n_steps=500):
    from gym_flock.envs.linear.lqr import LQREnv

    env = LQREnv()
    env.seed(0)
    env.reset()
    rng = np.random.RandomState(1)
    u = rng.uniform(-1, 1, size=(env.n_nodes, 1))

    def loop(n):
        for _ in range(n):
            env.step(u)

    loop(20)
    return best_of(loop, n_steps)


def bench_mapping(n_steps=300):
    from gym_flock.envs.old.mapping import MappingEnv

    env = MappingEnv()
    env.seed(0)
    env.reset()

    def loop(n):
        for _ in range(n):
            u = env.controller()
            env.step(u)

    loop(20)
    return best_of(loop, n_steps)


def main():
    load_reference()
    out = {}
    for name, fn in [
        ("shepherding_expert_step_per_s", bench_shepherding),
        ("formation_step_per_s", bench_formation),
        ("lqr_step_per_s", bench_lqr),
        ("mapping_expert_step_per_s", bench_mapping),
    ]:
        try:
            out[name] = round(fn(), 1)
        except Exception as e:  # pragma: no cover
            out[name] = f"FAILED: {e!r}"
    print(json.dumps(out))


if __name__ == "__main__":
    main()

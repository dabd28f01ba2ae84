"""Coverage graph-MDP throughput: batched greedy-expert stepping on TPU.

Reference baseline: ~2,381 env-steps/s for Coverage-v0 with the greedy
controller, single NumPy stream (BASELINE.md).  Here B envs step in lockstep
under jit(scan(vmap)) with the on-device greedy expert.

Usage: python benchmarks/coverage_bench.py [B] [T]
Prints one JSON line (same schema as bench.py).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

import gym_flock_tpu as gft

BASELINE = 2381.0


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    T = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    env, params = gft.make("Coverage-v0", n_graphs=4)

    @jax.jit
    def run(key):
        keys = jax.random.split(key, B)

        def one(key):
            state, _ = env.reset_env(key, params)

            def body(carry, key_t):
                state = carry
                k1, k2 = jax.random.split(key_t)
                u = env.controller(state, params, key=k1, greedy=True)
                state, _, r, d, _ = env.step_env(k2, state, u, params)
                return state, r

            step_keys = jax.random.split(key, T)
            state, rs = jax.lax.scan(body, state, step_keys)
            return jnp.sum(rs)

        return jnp.sum(jax.vmap(one)(keys))

    float(run(jax.random.key(0)))  # compile + warm (fetch forces completion)
    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        float(run(jax.random.key(i + 1)))
    dt = time.perf_counter() - t0
    steps_per_s = B * T * iters / dt
    print(
        json.dumps(
            {
                "metric": "env-steps/s (Coverage-v0, 6 robots, greedy expert)",
                "value": round(steps_per_s, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_s / BASELINE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()

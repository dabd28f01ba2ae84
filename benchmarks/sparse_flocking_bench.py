"""Block-sparse (cell-list) vs dense flocking kernel at large N.

The dense pairwise pass is O(N^2); the Hilbert-sorted block-sparse pass
(ops.sparse_flocking) is O(N * neighbors).  Fetch-amortized timing (see
large_flocking_bench.py for why).

Usage: python benchmarks/sparse_flocking_bench.py [N] [B] [K] [ITERS]
Prints one JSON line (same schema as bench.py).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from gym_flock_tpu.ops.sparse_flocking import flocking_sums_sparse

# reference compute_helpers + controller at N=100: 835 steps/s * 100^2 pairs
BASELINE_PAIRS_PER_S = 835.0 * 100 * 100


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    k1, k2 = jax.random.split(jax.random.key(0))
    pos = jax.random.uniform(k1, (B, N, 2)) * jnp.sqrt(N * 1.0)  # ~1 agent/unit^2
    vel = jax.random.normal(k2, (B, N, 2))
    x = jnp.concatenate([pos, vel], axis=-1)

    @jax.jit
    def run(x0):
        def body(xc, _):
            s = flocking_sums_sparse(xc, 0.9, 0.81)
            return xc + s[:, :, :4] * 1e-30, jnp.sum(s[:, :, :9])

        xK, accs = jax.lax.scan(body, x0, None, length=K)
        return jnp.sum(accs) + jnp.sum(xK) * 0.0

    float(run(x))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        float(run(x))
        best = min(best, time.perf_counter() - t0)

    pairs_per_s = B * N * N * K / best  # dense-equivalent rate
    print(
        json.dumps(
            {
                "metric": f"dense-equiv pairwise/s (flocking_sums_sparse, N={N}, B={B})",
                "value": round(pairs_per_s / 1e9, 2),
                "unit": "Gpair/s",
                "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Large-swarm kernel throughput: the fused Pallas flocking_sums pass.

The reference cannot represent this regime at all — its dense NumPy
``compute_helpers`` (flocking_relative.py:111-134) allocates five [N, N]
f64 arrays per step (at N=8192 that is 2.7 GB per array) and runs
single-threaded.  The baseline below is therefore the reference kernel's
measured *pair rate* at its design point (N=100: ~835 steps/s x 10^4 pairs
~= 8.4 Mpair/s including the expert); this kernel's Gpair/s on one TPU chip
is directly comparable because both numbers include the full 6-channel
feature reduction.

Timing: K kernel calls are chained inside ONE jit through a 1e-30-scale
data dependency, and the wall clock brackets a scalar fetch.  On the
remote-attached chip a per-call fetch costs tens of ms of tunnel latency —
an unchained loop measures the tunnel, not the kernel (first measurement
of this kernel read 2.8 Gpair/s where the true rate is ~30).

Usage: python benchmarks/large_flocking_bench.py [N] [B] [K] [ITERS]
Prints one JSON line (same schema as bench.py).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

from gym_flock_tpu.ops.pallas_flocking import flocking_sums

# reference compute_helpers + controller at N=100: 835 steps/s * 100^2 pairs
BASELINE_PAIRS_PER_S = 835.0 * 100 * 100


def main():
    N = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    iters = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    x = jax.random.normal(jax.random.key(0), (B, N, 4), jnp.float32) * 2.0

    @jax.jit
    def run(x0):
        def body(xc, _):
            s = flocking_sums(xc, 0.9, 0.81)
            # all nine core channels feed the carry: nothing is DCE'd or
            # CSE'd across the K chained calls
            return xc + s[:, :, :4] * 1e-30, jnp.sum(s[:, :, :9])

        xK, accs = jax.lax.scan(body, x0, None, length=K)
        return jnp.sum(accs) + jnp.sum(xK) * 0.0

    float(run(x))  # compile + warm (fetch forces completion on remote chips)
    t0 = time.perf_counter()
    for _ in range(iters):
        float(run(x))
    dt = time.perf_counter() - t0

    pairs_per_s = B * N * N * K * iters / dt
    print(
        json.dumps(
            {
                "metric": f"pairwise-interactions/s (flocking_sums, N={N}, B={B})",
                "value": round(pairs_per_s / 1e9, 2),
                "unit": "Gpair/s",
                "vs_baseline": round(pairs_per_s / BASELINE_PAIRS_PER_S, 1),
            }
        )
    )


if __name__ == "__main__":
    main()

"""Real-hardware smoke: compiled Mosaic kernels under shard_map on the chip.

The CI suite runs on a virtual CPU mesh where Pallas executes in interpret
mode, so the (multi-device path) x (compiled Mosaic) combination is never
exercised there (VERDICT r1 weak #7).  This script closes that gap to the
extent one physical chip allows: it builds a REAL 1-device mesh on the TPU
and runs the agent-sharded kernels with ``use_pallas=True`` inside
``shard_map`` — the identical program structure the multi-chip path uses
(ring schedule, collectives, Pallas tile per ring step), with the
collectives degenerate at world size 1 but the Mosaic kernels fully
compiled and executed.  Verifies against the dense XLA kernel.

Run on the TPU: ``python benchmarks/tpu_smoke.py`` (prints one JSON line).
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    assert jax.default_backend() not in ("cpu",), (
        "run on the TPU — this smoke exists to execute compiled Mosaic"
    )
    from jax.sharding import PartitionSpec as P

    from gym_flock_tpu.ops.pallas_flocking import flocking_sums
    from gym_flock_tpu.parallel import make_flock_mesh
    from gym_flock_tpu.parallel.agent_shard import (
        flocking_step_sharded,
        flocking_sums_sharded,
    )

    CR, CR2 = 0.9, 0.81
    N = 512
    x = jax.random.normal(jax.random.key(0), (N, 4)) * 4.0

    mesh = make_flock_mesh(1, 1)  # real 1-device TPU mesh
    dp, ap = mesh.axis_names

    def local(xl):
        s = flocking_sums_sharded(
            xl, CR, CR2, ap, mode="ring", use_pallas=True, channels="core"
        )
        x2, values, reward = flocking_step_sharded(
            xl, __import__("gym_flock_tpu").envs.flocking.FlockingParams(
                n_agents=N
            ), ap, "ring", use_pallas=True,
        )
        return s, values, reward

    s, values, reward = jax.jit(
        jax.shard_map(local, mesh=mesh, in_specs=P(ap), out_specs=(P(ap), P(ap), P()))
    )(x)

    want = flocking_sums(x, CR, CR2, impl="xla")
    got = np.asarray(s)[:, :9]
    ref = np.asarray(want)[:, :9]
    err = float(np.max(np.abs(got - ref) / (1.0 + np.abs(ref))))

    # rowmin (the metric-3 critical path since r5): compiled Mosaic vs the
    # identical-arithmetic XLA formulation must agree EXACTLY on-chip —
    # the CI suite only exercises the interpreter
    from gym_flock_tpu.ops.rowmin import (
        _rowmin_pallas,
        _rowmin_xla,
        pad_cost_rows,
    )

    rng = np.random.RandomState(3)
    G, T, B, R = 2, 300, 16, 33
    mm = rng.randint(0, 20, size=(G, T, T)).astype(np.float32)
    mm[rng.rand(G, T, T) < 0.1] = 1024.0
    cost_pad = jnp.asarray(pad_cost_rows(mm), jnp.bfloat16)
    rowidx = jnp.asarray(rng.randint(0, G * T, size=(B, R)), jnp.int32)
    blocked = jnp.asarray(rng.rand(B, T) < 0.6)
    m_tpu = np.asarray(jax.jit(_rowmin_pallas)(rowidx, blocked, cost_pad))
    m_ref = np.asarray(
        jax.jit(jax.vmap(_rowmin_xla, in_axes=(0, 0, None)))(
            rowidx, blocked, cost_pad
        )
    )
    rowmin_exact = bool(np.array_equal(m_tpu, m_ref))

    ok = err < 1e-4 and bool(np.isfinite(float(reward))) and rowmin_exact
    print(
        json.dumps(
            {
                "metric": "compiled-Mosaic-under-shard_map smoke (1-dev TPU mesh)",
                "value": 1.0 if ok else 0.0,
                "unit": "pass",
                "vs_baseline": err,
            }
        )
    )
    assert ok, f"max rel err {err}, rowmin_exact={rowmin_exact}"


if __name__ == "__main__":
    main()

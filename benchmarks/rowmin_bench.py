"""Microbenchmark: controller cost-row packed-min at ExploreFull shapes.

Compares the r4 XLA formulation (gather [B*R, T] bf16 rows + fused reduce,
measured ~58 GB/s effective) against ops.rowmin's fused Pallas kernel at
the real-facility shape (B=512, R=100, T=5659).  Prints ms/batched-step
and effective GB/s over the contract bytes (B*R*T*2 row reads).

Run on the TPU box: python benchmarks/rowmin_bench.py
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from gym_flock_tpu.ops.rowmin import _rowmin_pallas, _rowmin_xla, pad_cost_rows

B, R, T, K = 512, 100, 5659, 20


def bench(fn, *args, iters=3):
    out = fn(*args)
    tot = float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
    best = np.inf
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        tot = float(jnp.sum(out[0]) if isinstance(out, tuple) else jnp.sum(out))
        best = min(best, time.perf_counter() - t0)
    return best, tot


def main():
    rng = np.random.RandomState(0)
    mm = rng.randint(0, 20, size=(1, T, T)).astype(np.float32)
    mm[rng.rand(1, T, T) < 0.05] = 1024.0
    cost_pad = jnp.asarray(pad_cost_rows(mm), jnp.bfloat16)
    mm_b = jnp.asarray(mm[0], jnp.bfloat16)  # [T, T] like bank graph_cost_mm[0]
    curs = jnp.asarray(rng.randint(0, T, size=(K, B, R)), jnp.int32)
    blocked = jnp.asarray(rng.rand(K, B, T) < 0.5)

    @jax.jit
    def run_xla_current(curs, blocked, mm_b):
        # r4 controller formulation: unpadded row gather + fused packed min,
        # one batched step per scan iteration (matches the rollout scan)
        def env(c, b):
            rows = mm_b[c].astype(jnp.float32)
            idx = jnp.arange(T, dtype=jnp.float32)
            packed = jnp.where(b[None, :], 1024.0, rows) * 8192.0 + idx[None, :]
            return jnp.min(packed, axis=1)

        def step(acc, cb):
            cur, blk = cb
            return acc + jnp.sum(jax.vmap(env)(cur, blk)), None

        acc, _ = jax.lax.scan(step, 0.0, (curs, blocked))
        return acc

    @jax.jit
    def run_pallas(curs, blocked, cost_pad):
        def step(acc, cb):
            cur, blk = cb
            return acc + jnp.sum(_rowmin_pallas(cur, blk, cost_pad)), None

        acc, _ = jax.lax.scan(step, 0.0, (curs, blocked))
        return acc

    # correctness first: exact equality on one batch
    m_xla = jax.jit(
        lambda c, b: jax.vmap(_rowmin_xla, in_axes=(0, 0, None))(c, b, cost_pad)
    )(curs[0], blocked[0])
    m_pal = jax.jit(
        lambda c, b: _rowmin_pallas(c, b, cost_pad)
    )(curs[0], blocked[0])
    eq = bool(jnp.all(m_xla == m_pal))
    print(f"exact_equal={eq}")
    assert eq

    bytes_per = B * R * T * 2  # contract row reads per batched step
    for name, fn, args in [
        ("xla_gather", run_xla_current, (curs, blocked, mm_b)),
        ("pallas_fused", run_pallas, (curs, blocked, cost_pad)),
    ]:
        t0 = time.perf_counter()
        sec, tot = bench(fn, *args)
        ms = sec / K * 1e3
        print(
            f"{name}: {ms:.2f} ms/batched-step, "
            f"{bytes_per / (sec / K) / 1e9:.1f} GB/s effective "
            f"(first-call {time.perf_counter() - t0:.0f}s, checksum {tot:.3e})"
        )


if __name__ == "__main__":
    main()

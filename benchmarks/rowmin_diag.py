"""Diagnose the rowmin kernel's binding term: overhead vs bandwidth.

Sweeps rows-per-step (ch), and compares random vs sequential row indices
(sequential removes DRAM page thrash; if it is much faster, the random-row
pattern itself is the ceiling).  Also measures the raw contiguous read
bandwidth of the same total bytes as an upper bound.
"""
import sys
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from gym_flock_tpu.ops.rowmin import _rowmin_pallas, pad_cost_rows

B, R, T, K = 512, 100, 5659, 20


def timeit(fn, *args):
    fn(*args)  # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.RandomState(0)
    mm = rng.randint(0, 20, size=(1, T, T)).astype(np.float32)
    cost_pad = jnp.asarray(pad_cost_rows(mm), jnp.bfloat16)
    cur_rand = jnp.asarray(rng.randint(0, T, size=(K, B, R)), jnp.int32)
    cur_seq = jnp.asarray(
        (np.arange(B * R).reshape(1, B, R) + np.arange(K).reshape(K, 1, 1)) % T,
        jnp.int32,
    )
    blocked = jnp.asarray(rng.rand(K, B, T) < 0.5)
    bytes_per = B * R * T * 2

    def make_run(ch):
        @jax.jit
        def run(curs, blocked, cost_pad):
            def step(acc, cb):
                cur, blk = cb
                return acc + jnp.sum(_rowmin_pallas(cur, blk, cost_pad, ch=ch)), None

            acc, _ = jax.lax.scan(step, 0.0, (curs, blocked))
            return acc

        return run

    # raw contiguous-read bound: reduce the operand K*BR/T times over
    reads = B * R // T + 1  # ~9 full passes ~= same bytes
    @jax.jit
    def raw(cost_pad):
        def step(acc, _):
            return acc + jnp.sum(cost_pad.astype(jnp.float32)), None
        acc, _ = jax.lax.scan(step, 0.0, None, length=reads)
        return acc

    sec = timeit(raw, cost_pad)
    rb = cost_pad.size * 2 * reads
    print(f"contiguous read: {rb / sec / 1e9:.0f} GB/s")

    for ch in (16, 32, 64):
        for name, cur in (("rand", cur_rand), ("seq", cur_seq)):
            sec = timeit(make_run(ch), cur, blocked, cost_pad)
            ms = sec / K * 1e3
            print(f"ch={ch} {name}: {ms:.2f} ms/step, "
                  f"{bytes_per / (sec / K) / 1e9:.1f} GB/s")


if __name__ == "__main__":
    main()

"""Multi-host pod scale-out: initialization, meshes, and per-host RNG.

The reference is a single NumPy process with no distribution story
(SURVEY.md §2.3).  Here scale-out is pure JAX plumbing: because rollouts and
the DP train step are written against a ``Mesh`` (``rollout.py``,
``train.py``), running on a multi-host pod slice requires only

    from gym_flock_tpu.parallel.distributed import initialize, global_env_mesh
    initialize()                       # jax.distributed under the hood
    mesh = global_env_mesh("env")      # all chips on all hosts

and the same ``sharded_rollout`` / ``make_sharded_train_step`` calls.  Data
layout rules that keep collectives on ICI:

* the env-batch axis shards over *all* chips (envs are independent, so the
  per-step program has zero cross-device communication);
* model params/optimizer state are replicated; gradient ``pmean`` is the one
  all-reduce per step and rides ICI within a slice;
* host-side artifacts (graph banks, VRP labels) are broadcast once — banks
  are identical on every host by construction (same seed), so no transfer is
  needed; per-host RNG streams come from :func:`host_fold` folding the
  process index into the key.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np

__all__ = ["initialize", "global_env_mesh", "host_fold", "local_shard_size"]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` with env-var autodetection.

    No-op on a single host (so the same program runs everywhere).  On TPU
    pods the arguments are autodetected from the metadata server; on other
    clusters pass them explicitly.
    """
    if num_processes is None and coordinator_address is None:
        # single-process or TPU-autodetected environment
        try:
            jax.distributed.initialize()
        except Exception:
            # already initialized, or single-host without cluster env: fine
            pass
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def global_env_mesh(axis_name: str = "env") -> jax.sharding.Mesh:
    """1-D mesh over every chip of every host (env-batch / dp axis)."""
    return jax.sharding.Mesh(np.asarray(jax.devices()), (axis_name,))


def host_fold(key: jax.Array) -> jax.Array:
    """Fold this host's process index into a PRNG key.

    Use for host-local randomness (e.g. host-side VRP label sampling);
    device-side keys should instead be split globally and sharded so results
    are independent of host count.
    """
    return jax.random.fold_in(key, jax.process_index())


def local_shard_size(n_global: int) -> int:
    """Rows of a globally sharded batch owned by this process."""
    n_proc = jax.process_count()
    assert n_global % n_proc == 0, (n_global, n_proc)
    return n_global // n_proc

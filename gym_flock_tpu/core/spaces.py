"""Minimal, dependency-free observation/action space descriptions.

The reference uses gym 0.11 spaces (``gym.spaces.Box``, ``MultiDiscrete``,
``Dict``; see reference gym_flock/envs/flocking/flocking_relative.py:56-60 and
gym_flock/envs/spatial/coverage.py:604-619).  gym is not a dependency of this
framework; these lightweight equivalents carry the same metadata (shape, dtype,
bounds) and support ``sample`` / ``contains`` so user code and tests can swap
over without pulling in gym.

Spaces here are *descriptions only* — sampling uses ``jax.random`` keys so it
is reproducible and jit/vmap friendly.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Mapping, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Space", "Box", "Discrete", "MultiDiscrete", "DictSpace", "flatten_space"]


class Space:
    """Base class for all spaces."""

    shape: Tuple[int, ...]
    dtype: Any

    def sample(self, key: jax.Array):
        raise NotImplementedError

    def contains(self, x) -> bool:
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Box(Space):
    """Continuous box in R^n. Mirrors gym.spaces.Box semantics."""

    low: float
    high: float
    shape: Tuple[int, ...]
    dtype: Any = jnp.float32

    def sample(self, key: jax.Array):
        low = self.low if np.isfinite(self.low) else -1.0
        high = self.high if np.isfinite(self.high) else 1.0
        return jax.random.uniform(
            key, self.shape, minval=low, maxval=high, dtype=self.dtype
        )

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return x.shape == self.shape and bool(
            np.all(x >= self.low) and np.all(x <= self.high)
        )


@dataclasses.dataclass(frozen=True)
class Discrete(Space):
    """{0, 1, ..., n-1}."""

    n: int
    dtype: Any = jnp.int32

    @property
    def shape(self) -> Tuple[int, ...]:  # type: ignore[override]
        return ()

    def sample(self, key: jax.Array):
        return jax.random.randint(key, (), 0, self.n, dtype=self.dtype)

    def contains(self, x) -> bool:
        return 0 <= int(x) < self.n


@dataclasses.dataclass(frozen=True)
class MultiDiscrete(Space):
    """Cartesian product of discrete spaces with per-dim cardinality ``nvec``.

    Mirrors ``spaces.MultiDiscrete([n_actions] * n_robots)`` used by the
    coverage envs (reference coverage.py:604).
    """

    nvec: Tuple[int, ...]
    dtype: Any = jnp.int32

    @property
    def shape(self) -> Tuple[int, ...]:  # type: ignore[override]
        return (len(self.nvec),)

    def sample(self, key: jax.Array):
        nvec = jnp.asarray(self.nvec, dtype=self.dtype)
        return jax.random.randint(
            key, (len(self.nvec),), 0, nvec, dtype=self.dtype
        )

    def contains(self, x) -> bool:
        x = np.asarray(x)
        return x.shape == (len(self.nvec),) and bool(
            np.all(x >= 0) and np.all(x < np.asarray(self.nvec))
        )


@dataclasses.dataclass(frozen=True)
class DictSpace(Space):
    """Ordered mapping of named sub-spaces (gym.spaces.Dict analog)."""

    spaces: Mapping[str, Space]

    @property
    def shape(self):  # type: ignore[override]
        return {k: s.shape for k, s in self.spaces.items()}

    def sample(self, key: jax.Array):
        keys = jax.random.split(key, len(self.spaces))
        return {k: s.sample(sk) for (k, s), sk in zip(self.spaces.items(), keys)}

    def contains(self, x) -> bool:
        return isinstance(x, Mapping) and all(
            k in x and s.contains(x[k]) for k, s in self.spaces.items()
        )

    def keys(self) -> Sequence[str]:
        return list(self.spaces.keys())


def flatten_space(space: Space) -> int:
    """Number of scalar entries in a flattened sample of ``space``.

    Matches the flattening performed by gym's FlattenDictWrapper as used in
    the reference driver (reference test.py:33).
    """
    if isinstance(space, DictSpace):
        return sum(flatten_space(s) for s in space.spaces.values())
    if isinstance(space, (Box,)):
        return int(np.prod(space.shape))
    if isinstance(space, MultiDiscrete):
        return len(space.nvec)
    if isinstance(space, Discrete):
        return 1
    raise TypeError(f"Cannot flatten {space!r}")

"""Initial-formation generators + AirSim settings parsing.

Mirror of reference gym_flock/envs/flocking/utils.py:6-77: circle / grid /
two-flock starting formations used by the flocking variants and the AirSim
bridge, plus the regex parser for AirSim ``settings.json`` vehicle homes.
"""
from __future__ import annotations

import re
from typing import Tuple

import numpy as np

__all__ = ["circle_helper", "circle", "grid", "twoflocks", "parse_settings"]


def circle_helper(n: int, dist: float) -> Tuple[np.ndarray, np.ndarray]:
    """Points on a circle with inter-agent spacing ``dist`` and inward-ish
    velocities (reference utils.py:6-10)."""
    r = dist * n / 2 / np.pi
    angles = np.linspace(0, 2 * np.pi, n, endpoint=False).reshape((n, 1))
    pos = r * np.hstack((np.cos(angles), np.sin(angles)))
    vel = -0.5 * np.hstack((np.cos(angles), -0.5 * np.sin(angles)))
    return pos, vel


def circle(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """One circle for n <= 20, two concentric rings beyond (utils.py:13-20)."""
    if n <= 20:
        return circle_helper(n, 0.5)
    smalln = int(n * 2.0 / 5.0)
    c1, v1 = circle_helper(smalln, 0.5)
    c2, v2 = circle_helper(n - smalln, 0.5)
    return np.vstack((c1, c2)), np.vstack((v1, v2))


def grid(n: int, side: int = 5) -> np.ndarray:
    """0.8-spaced centered grid (utils.py:23-30).

    Byte-identical to the reference when ``n`` is a multiple of ``side``;
    for other ``n`` the reference CRASHES (utils.py:29 reshape) — here the
    enclosing grid is built and the first ``n`` points kept, so bridge
    fleets of any size (e.g. the 2-drone settings2.json) can reset.
    """
    side2 = int(n / side)
    if side * side2 != n:
        side2 = -(-n // side)  # ceil: enough rows to cover n
        xs = np.arange(0, side) - side / 2.0
        ys = np.arange(0, side2) - side2 / 2.0
        xs, ys = np.meshgrid(xs, ys)
        pts = 0.8 * np.hstack((xs.reshape((-1, 1)), ys.reshape((-1, 1))))
        return pts[:n]
    xs = np.arange(0, side) - side / 2.0
    ys = np.arange(0, side2) - side2 / 2.0
    xs, ys = np.meshgrid(xs, ys)
    return 0.8 * np.hstack((xs.reshape((n, 1)), ys.reshape((n, 1))))


def twoflocks(n: int, delta: float = 6, side=None) -> Tuple[np.ndarray, np.ndarray]:
    """Two opposing grids delta apart with colliding velocities (utils.py:33-50)."""
    half_n = int(n / 2)
    grid1 = grid(half_n) if side is None else grid(half_n, side)
    grid2 = grid1.copy() + np.array([[0, delta / 2]])
    grid1 = grid1 + np.array([[0, -delta / 2]])
    vels1 = np.tile(np.array([[0.0, delta]]), (half_n, 1))
    vels2 = np.tile(np.array([[0.0, -delta]]), (half_n, 1))
    return np.vstack((grid1, grid2)), np.vstack((vels1, vels2))


def parse_settings(fname: str) -> Tuple[list, np.ndarray]:
    """Extract vehicle names and home offsets from an AirSim settings.json.

    Primary path mirrors reference utils.py:67-77 byte-compatibly — a
    line-based regex that requires the ``"X": .., "Y": .., "Z": ..`` triple
    on ONE line (the fixture style) and collects every ``"Name": {`` key
    except "Vehicles" (including the reference's quirk of also matching
    non-vehicle object keys).  Pretty-printed settings (one coordinate per
    line — the AirSim docs' format) never match the triple regex and the
    reference crashes or silently misaligns names/homes; here any
    name/home count mismatch falls back to a real JSON parse of the
    ``Vehicles`` section (insertion order, missing coordinates = 0).
    """
    names = []
    homes = []
    for line in open(fname):
        for n in re.findall(r"\"(.+?)\": {", line):
            if n != "Vehicles":
                names.append(n)
        p = re.findall(
            r'"X": ([-+]?\d*\.*\d+), "Y": ([-+]?\d*\.*\d+), "Z": ([-+]?\d*\.*\d+)',
            line,
        )
        if p:
            homes.append(
                np.array([float(p[0][0]), float(p[0][1]), float(p[0][2])]).reshape(
                    (1, 3)
                )
            )
    if homes and len(homes) == len(names):
        return names, np.concatenate(homes, axis=0)
    # fallback: structured parse (multi-line / pretty-printed settings)
    import json

    with open(fname) as f:
        vehicles = json.load(f).get("Vehicles", {})
    names = list(vehicles)
    if not names:
        raise ValueError(f"no Vehicles found in {fname}")
    homes = np.array(
        [[float(v.get(k, 0.0)) for k in ("X", "Y", "Z")] for v in vehicles.values()]
    )
    return names, homes

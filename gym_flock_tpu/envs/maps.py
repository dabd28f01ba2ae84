"""Discovery of the real ARL occupancy maps.

The reference ships binary occupancy grids of a real ARL facility as data
assets — ``gym_flock/envs/spatial/maps/grid_slice{2,5,10}.npy``, loaded by
``from_occupancy`` (reference make_map.py:234-240; the downsample rate N
selects ``grid_sliceN.npy``).  Byte-identical copies of those MIT-licensed
data files are bundled with this package (``gym_flock_tpu/data/maps/``), so
the occupancy env family (CoverageARL / CoverageFull / Explore /
ExploreFull) defaults to the real facility world on a clean clone with no
reference checkout present.  Discovery still honors external sources first
(env-var override), and falls back to procedurally generated maps only when
disabled outright
(:func:`gym_flock_tpu.envs.coverage_graph.generate_occupancy_map`).

Search order (first hit wins):

1. ``$GYM_FLOCK_TPU_MAPS`` — a directory containing ``grid_sliceN.npy``.
   Set it to ``off`` / ``none`` / ``0`` to disable discovery entirely
   (procedural maps even when the bundled copies are present — the test
   suite does this so the default tier stays fast and world-size stable).
2. The bundled package data (``gym_flock_tpu/data/maps/``).
3. An installed ``gym_flock`` package (``pip install gym-flock`` or a
   source install of the reference) — its bundled ``maps/`` directory.
4. ``$GYM_FLOCK_REFERENCE`` — path to a gym-flock source checkout.
5. ``/root/reference`` — the conventional read-only checkout location this
   repo's parity suite uses (tests/reference_oracle.py).

Because the bundled copies (item 2) are byte-identical to the reference's
and sit ahead of items 3-5, CUSTOM map files placed in a checkout are
shadowed by them — to substitute your own ``grid_sliceN.npy``, point
``$GYM_FLOCK_TPU_MAPS`` (item 1, the explicit override) at its directory.

Converting a map into device-ready graph banks takes tens of seconds for
the full-facility variants (all-pairs hop costs on thousands of nodes);
banks are content-keyed and disk-cached by ``default_coverage_bank``, so
the cost is paid once per (map contents, env config).  Run
``python examples/convert_arl_map.py`` to pre-build every variant's bank
ahead of time (CI images, bench boxes).
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional

__all__ = ["find_reference_map", "reference_map_dirs"]

_DISABLED = ("off", "none", "0", "false")


def reference_map_dirs() -> list:
    """Candidate directories that may hold ``grid_sliceN.npy``, in search
    order.  Pure path assembly — no filesystem access beyond existence
    checks done by :func:`find_reference_map`."""
    dirs = []
    env_dir = os.environ.get("GYM_FLOCK_TPU_MAPS", "")
    if env_dir.strip().lower() in _DISABLED:
        return []
    if env_dir:
        dirs.append(Path(env_dir))

    # the bundled byte-identical copies (MIT-licensed data; see LICENSE)
    dirs.append(Path(__file__).resolve().parent.parent / "data" / "maps")

    # an installed gym_flock package (find_spec does not import it)
    try:
        import importlib.util

        spec = importlib.util.find_spec("gym_flock")
        if spec is not None and spec.submodule_search_locations:
            for loc in spec.submodule_search_locations:
                dirs.append(Path(loc) / "envs" / "spatial" / "maps")
    except (ImportError, ValueError):  # pragma: no cover
        pass

    # both the env-var checkout AND the conventional /root/reference
    # location are searched (documented order items 4 and 5) — a wrong
    # $GYM_FLOCK_REFERENCE must not hide a checkout at the default path
    ref = os.environ.get("GYM_FLOCK_REFERENCE")
    for checkout in ([ref] if ref else []) + ["/root/reference"]:
        d = Path(checkout) / "gym_flock" / "envs" / "spatial" / "maps"
        if d not in dirs:
            dirs.append(d)
    return dirs


def find_reference_map(downsample_rate: int = 10) -> Optional[str]:
    """Locate ``grid_slice{downsample_rate}.npy`` or return ``None``.

    ``downsample_rate=10`` is what every reference occupancy env uses
    (coverage_arl.py:19 default; coverage_full.py:3 and
    coverage_explore_full.py:3 both pin DOWNSAMPLE_RATE = 10).
    """
    name = f"grid_slice{downsample_rate}.npy"
    dirs = reference_map_dirs()
    for i, d in enumerate(dirs):
        p = d / name
        try:
            if p.is_file():
                _warn_if_shadowing(p, name, dirs[i + 1 :])
                return str(p)
        except OSError:  # pragma: no cover
            continue
    return None


_warned_shadow: set = set()


def _warn_if_shadowing(hit: Path, name: str, lower_dirs: list) -> None:
    """One-time warning when a lower-priority source holds a DIFFERENT
    ``grid_sliceN.npy`` than the one selected (ADVICE r4 #4): users who
    placed custom map files in a checkout would otherwise silently get the
    bundled byte-identical-to-reference copies.  Same-content copies (the
    normal case — bundled data shadowing the reference checkout) stay
    silent."""
    if name in _warned_shadow:
        return
    import hashlib

    # sha256, not md5: md5() raises on FIPS-enforced Python builds and
    # this is a content-equality check, not a security boundary
    try:
        hit_digest = hashlib.sha256(hit.read_bytes()).hexdigest()
    except OSError:  # pragma: no cover
        return
    for d in lower_dirs:
        q = d / name
        try:
            if q.is_file() and hashlib.sha256(q.read_bytes()).hexdigest() != hit_digest:
                import warnings

                _warned_shadow.add(name)
                warnings.warn(
                    f"{hit} shadows a different {name} at {q}; set "
                    "$GYM_FLOCK_TPU_MAPS to that directory to use it instead",
                    stacklevel=3,
                )
                return
        except OSError:  # pragma: no cover
            continue
    _warned_shadow.add(name)

"""Visual self-test for the map-generation pipeline.

Analog of the reference's inline demo (reference make_map.py:183-204 plots
a sheared lattice with rectangular-obstacle rejection) extended to every
map source the coverage envs use: triangular lattice + obstacle rejection,
a random cities/roads world (Delaunay waypoints), and — when a
grid_slice10.npy is discoverable (bundled package data by default) — the
real ARL facility's perimeter-adjacent free cells.

Headless by default: writes PNGs to --out (default ./map_plots).  Pass
--show to open interactive windows instead (needs a display).

Usage:  python examples/plot_maps.py [--out DIR] [--show]
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="map_plots")
    ap.add_argument("--show", action="store_true")
    args = ap.parse_args(argv)

    import matplotlib

    if not args.show:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from gym_flock_tpu.envs.coverage_graph import (
        generate_coverage_targets,
        generate_lattice,
        reject_collisions,
        targets_from_occupancy,
    )
    from gym_flock_tpu.envs.maps import find_reference_map

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    made = []

    def finish(name):
        if args.show:
            plt.show()
        else:
            path = out / f"{name}.png"
            plt.savefig(path, dpi=120, bbox_inches="tight")
            plt.close()
            made.append(path)

    # 1. triangular lattice + rectangular-obstacle rejection — the
    # reference demo's exact configuration (make_map.py:186-201)
    lattice_vectors = [
        3.0 * np.array([-1.44, -1.44]),
        3.0 * np.array([-1.44, 1.44]),
    ]
    spots = generate_lattice((0, 100, 0, 100), lattice_vectors)
    spots = reject_collisions(spots, [(10, 45, 10, 90), (55, 90, 10, 90)])
    plt.figure(figsize=(5, 5))
    plt.plot(spots[:, 1], spots[:, 0], ".")
    plt.title("sheared lattice + obstacle rejection")
    finish("lattice_obstacles")

    # 2. cities/roads world: lattice ∩ Delaunay road corridors — the
    # Coverage-v0 target generator (reference coverage.py:516-527)
    rng = np.random.RandomState(3)
    targets = generate_coverage_targets(rng)
    plt.figure(figsize=(5, 5))
    plt.plot(targets[:, 0], targets[:, 1], ".", markersize=3)
    plt.title(f"road-lattice targets (n={len(targets)})")
    finish("road_lattice")

    # 3. real ARL facility map, when discoverable (bundled by default)
    path = find_reference_map(10)
    if path is not None:
        t = targets_from_occupancy(
            path=path, downsample_rate=10, perimeter_delta=2.0
        )
        plt.figure(figsize=(6, 6))
        plt.plot(t[:, 0], t[:, 1], ".", markersize=2)
        plt.title(f"ARL facility free cells (n={len(t)})")
        finish("arl_facility")
    else:
        print("no grid_slice10.npy discoverable; skipping the ARL plot")

    for p in made:
        print(f"wrote {p}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

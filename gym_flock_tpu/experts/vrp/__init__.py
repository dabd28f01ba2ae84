"""ctypes bindings + lazy build for the native VRP solver.

The reference delegates its expert routing problem to OR-Tools' C++ routing
solver through SWIG (reference vrp_solver.py:78-134).  Here the solver is a
self-contained C++ module (vrp_solver.cc) compiled on first use with the
system toolchain and bound via ctypes — no SWIG/pybind dependency.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional

import numpy as np

__all__ = ["solve_vrp_raw", "native_available"]

_HERE = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_LOAD_LOCK = threading.Lock()  # first-use build/load vs thread-pooled callers


def _build_library() -> Path:
    src = _HERE / "vrp_solver.cc"
    lib = _HERE / "libvrp.so"
    if lib.exists() and lib.stat().st_mtime >= src.stat().st_mtime:
        return lib
    # build to a tmp path + atomic rename: concurrent first-use callers
    # (e.g. the thread-pooled labeler on a clean checkout, or two pytest
    # workers) must never see a half-written .so
    tmp = _HERE / f".libvrp.build.{os.getpid()}.so"
    cmd = [
        os.environ.get("CXX", "g++"),
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-o",
        str(tmp),
        str(src),
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    os.replace(tmp, lib)
    return lib


def _load() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        with _LOAD_LOCK:
            if _LIB is not None:  # raced another thread to the lock
                return _LIB
            return _load_locked()
    return _LIB


def _load_locked() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(_build_library()))
        argtypes = [
            ctypes.POINTER(ctypes.c_double),  # time_matrix
            ctypes.POINTER(ctypes.c_double),  # penalties
            ctypes.c_int,  # n_nodes
            ctypes.c_int,  # num_vehicles
            ctypes.POINTER(ctypes.c_int),  # init_loc
            ctypes.c_double,  # max_route_time
            ctypes.POINTER(ctypes.c_int32),  # out
            ctypes.c_int,  # max_len
        ]
        lib.vrp_solve.restype = ctypes.c_int
        lib.vrp_solve.argtypes = argtypes
        lib.vrp_solve_cheapest_arc.restype = ctypes.c_int
        lib.vrp_solve_cheapest_arc.argtypes = argtypes
        lib.vrp_solve_or_default.restype = ctypes.c_int
        lib.vrp_solve_or_default.argtypes = argtypes
        lib.vrp_solve_or_default_stats.restype = ctypes.c_int
        lib.vrp_solve_or_default_stats.argtypes = argtypes + [
            ctypes.POINTER(ctypes.c_longlong)
        ]
        lib.vrp_solve_or_default_rot.restype = ctypes.c_int
        lib.vrp_solve_or_default_rot.argtypes = argtypes + [
            ctypes.c_int, ctypes.c_int
        ]
        _LIB = lib
    return _LIB


def native_available() -> bool:
    try:
        _load()
        return True
    except Exception:
        return False


def solve_vrp_raw(
    time_matrix: np.ndarray,
    penalties: np.ndarray,
    init_loc: np.ndarray,
    max_route_time: float,
    mode: str = "or_default",
    collect_stats: bool = False,
    rot: int = 0,
    last_accept: bool = False,
) -> List[List[int]]:
    """Solve the depot-augmented VRP; returns per-vehicle node sequences
    (1-based node ids as in the depot-augmented matrix, depot excluded).

    ``mode``:
      * ``"or_default"`` (default) — the reference pipeline end to end:
        PATH_CHEAPEST_ARC construction followed by OR-Tools' default
        first-accept greedy-descent local search (relocate / exchange /
        cross / 2-opt / or-opt / make-active / make-inactive / swap-active,
        int64 costs, deterministic enumeration, stop at the first local
        optimum — operator-for-operator derivation in vrp_solver.cc);
      * ``"improve"`` — cheapest-arc + regret constructions with
        2-opt / relocate / or-opt improvement; best solution quality
        (measured +21% reward over the greedy expert);
      * ``"cheapest_arc"`` — OR-Tools PATH_CHEAPEST_ARC first-solution
        construction with exact arc ordering and tie-breaks (reference
        vrp_solver.py:115-134), no local search.

    ``collect_stats`` (``or_default`` only): return ``(routes, stats)``
    where ``stats = {"descent_steps": n, "ambiguous_steps": m}`` — m counts
    accepted moves whose composite neighborhood held >= 2 improving moves
    (the exposure of the documented enumeration-order caveat; the solve
    itself is identical, the counting pass never mutates).

    ``rot`` / ``last_accept`` (``or_default`` only): descent-path
    perturbation probes over the same composite neighborhood — ``rot``
    rotates the compound operator's initial order; ``last_accept`` applies
    each operator's LAST improving move (first-accept of the reversed
    intra-operator enumeration — exactly the unobservable axis of the
    OR-Tools caveat).  rot=0, last_accept=False is the canonical solve.
    Used to measure the outcome spread the ambiguity can cause.
    """
    lib = _load()
    n = time_matrix.shape[0]
    num_vehicles = len(init_loc)
    tm = np.ascontiguousarray(time_matrix, dtype=np.float64)
    pen = np.ascontiguousarray(penalties, dtype=np.float64)
    init = np.ascontiguousarray(init_loc, dtype=np.int32)
    max_len = n + 2
    out = np.full((num_vehicles, max_len), -1, dtype=np.int32)

    perturbed = bool(rot) or last_accept
    if (collect_stats or perturbed) and mode != "or_default":
        raise ValueError(
            "collect_stats/rot/last_accept are only meaningful for mode='or_default'"
        )
    if collect_stats and perturbed:
        raise ValueError("collect_stats and rot/last_accept are mutually exclusive")
    if mode == "cheapest_arc":
        fn = lib.vrp_solve_cheapest_arc
    elif mode == "or_default":
        fn = (lib.vrp_solve_or_default_stats if collect_stats
              else lib.vrp_solve_or_default_rot if perturbed
              else lib.vrp_solve_or_default)
    elif mode == "improve":
        fn = lib.vrp_solve
    else:
        raise ValueError(f"unknown VRP mode {mode!r}")
    stats_buf = np.zeros((2,), dtype=np.int64)
    args = [
        tm.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        pen.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(n),
        ctypes.c_int(num_vehicles),
        init.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        ctypes.c_double(max_route_time),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int(max_len),
    ]
    if collect_stats:
        args.append(stats_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)))
    elif perturbed:
        args.extend([ctypes.c_int(rot), ctypes.c_int(int(last_accept))])
    rc = fn(*args)
    if rc != 0:
        raise RuntimeError(f"vrp_solve failed with code {rc}")
    routes = []
    for v in range(num_vehicles):
        row = out[v]
        routes.append([int(x) for x in row[row >= 0]])
    if mode in ("cheapest_arc", "or_default"):
        # the construction's vehicle v claims the lowest-indexed UNCLAIMED
        # init location, not necessarily vehicle v's own; the reference
        # reassigns each route to the robot whose init matches its first
        # stop (vrp_solver.py:144-146) — without this, robots with
        # non-ascending node indices execute each other's tours
        # ("improve" mode pins vehicle v to init_loc[v] in the C++ and
        # needs no reassignment)
        assigned: List[List[int]] = [[] for _ in range(num_vehicles)]
        init_list = [int(i) for i in init_loc]
        taken = [False] * num_vehicles
        for route in routes:
            if not route:
                continue
            first = route[0]
            for r_i, loc in enumerate(init_list):
                if loc == first and not taken[r_i]:
                    assigned[r_i] = route
                    taken[r_i] = True
                    break
        routes = assigned
    if collect_stats:
        return routes, {
            "descent_steps": int(stats_buf[0]),
            "ambiguous_steps": int(stats_buf[1]),
        }
    return routes

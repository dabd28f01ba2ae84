"""Fused cost-row gather + packed greedy min (large-T coverage expert).

The greedy nearest-unvisited expert (reference coverage.py:800-826) needs,
per robot, ``argmin_t where(blocked, MAX, graph_cost[cur_r, t])``.  On the
real 5,659-node facility (T >= 4096, where the one-hot MXU route's
``cost*4096+idx`` packing is out of range and its O(T^2)-per-row FLOPs are
out of budget) the r4 XLA formulation gathered [B*R, T] bf16 rows and
reduced them — measured ~55-58 GB/s effective, and the single largest term
(~10 ms) of the 16 ms batched ExploreFull step.

This kernel never materializes the gathered rows.  A grid step covers CH
robots of one env: CH BlockSpec'd views of the SAME cost operand, whose
index maps read a scalar-prefetched ``g*T + cur`` table to pick each
robot's row (the gather happens in the pipeline's DMA address generation,
like ``ops.sparse_flocking``'s cell-list table), plus the env's blocked
mask — and writes only the [CH] packed minima.  HBM traffic drops to the
contract floor: one aligned 2-byte read per (robot, target) plus B*Tp mask
bytes, output B*R scalars.

Operand layout: each row is stored SUBLANE-FOLDED as [16, Tp/16] (flat
target index t = s * (Tp/16) + l).  A flat (1, Tp) row block occupies one
sublane of 16 in its VMEM tiles, so every vector op on it runs at 1/16
VPU utilization and combining CH such rows costs a sublane relayout per
row — measured 2x the whole kernel.  The folded layout makes each row a
fully-dense (16, Tp/16) bf16 tile stack: full-rate masking/packing, no
relayout, and the flat index rebuilds as ``s*L + l`` on iotas.

Exactness (bit-identical to the XLA path in ``envs.coverage.controller``):
the kernel evaluates the same f32 expression
``min_t where(blocked_t, 1024, c_t) * 8192 + t`` over integer-valued
quantities < 2^24 (costs <= 1024 by coverage_graph._mm_cost_copy, T <=
8192 by _cost_pack_marker), so every intermediate is exact; padding
columns carry cost 1024 at index >= T, which packs strictly above every
real column (any real packed value <= 1024*8192 + T-1 < 1024*8192 + T)
and therefore never wins the min.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

__all__ = ["packed_greedy_min", "pad_cost_rows", "CH_ROWS", "FOLD"]

CH_ROWS = 64  # fallback chunk for R > 128 (at R <= 128 the auto route uses
# whole-R chunks — no padding-row DMAs; see _rowmin_pallas)
FOLD = 16  # sublanes per folded row (= bf16 tile sublane count)
_MULT = 8192.0
_BLOCKED = 1024.0  # == coverage_graph._mm_cost_copy's unreachable sentinel


def pad_cost_rows(mm: np.ndarray) -> np.ndarray:
    """[G, T, T] bf16-able cost matrix -> [G*T, FOLD, Tp/FOLD] operand.

    Pad columns hold the 1024.0 blocked sentinel (see module docstring for
    why that is exact); Tp rounds T up to the 128-lane boundary so every
    row DMA is tile-aligned, then each row folds row-major into FOLD
    sublanes (flat index t = s * Tp/FOLD + l).
    """
    mm = np.asarray(mm, dtype=np.float32)
    G, T, T2 = mm.shape
    assert T == T2, mm.shape
    Tp = ((T + 127) // 128) * 128
    out = np.full((G * T, Tp), _BLOCKED, dtype=np.float32)
    out[:, :T] = mm.reshape(G * T, T)
    return out.reshape(G * T, FOLD, Tp // FOLD)


def _rowmin_kernel(rows_ref, blocked_ref, *refs, ch: int):
    """One grid step: CH gathered (folded) cost rows x one env's mask.

    ``refs`` = CH row views of the folded cost operand + [out_ref].
    rows_ref (scalar prefetch) is only consumed by the index maps.
    """
    del rows_ref
    out_ref = refs[-1]
    rp = out_ref.shape[-1]
    j = pl.program_id(1)
    brow = blocked_ref[0]  # [FOLD, L] f32, 1.0 = blocked (pads included)
    f, l = brow.shape
    # flat target index from the folded coordinates
    idx = (
        jax.lax.broadcasted_iota(jnp.int32, (f, l), 0) * l
        + jax.lax.broadcasted_iota(jnp.int32, (f, l), 1)
    ).astype(jnp.float32)
    masked_idx = jnp.where(brow > 0.5, _BLOCKED * _MULT + idx, idx)
    ms = []
    for i in range(ch):
        c = refs[i][0].astype(jnp.float32)  # [FOLD, L]
        packed = jnp.where(brow > 0.5, masked_idx, c * _MULT + idx)
        ms.append(jnp.min(packed))
    m = jnp.stack(ms)  # [ch]
    # dynamic-offset lane stores must be 128-aligned on TPU, so instead of
    # slicing out_ref we min-accumulate a masked full row: lanes of chunk j
    # carry this step's minima, all others +inf
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, rp), 2)
    mfull = jnp.where(
        lane // ch == j,
        jnp.tile(m, rp // ch)[None, None, :],
        jnp.inf,
    )

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.full((1, 1, rp), jnp.inf, jnp.float32)

    out_ref[...] = jnp.minimum(out_ref[...], mfull)


@jax.custom_batching.custom_vmap
def packed_greedy_min(rowidx: jax.Array, blocked: jax.Array, cost_pad: jax.Array):
    """Per-env packed greedy min: ``min_t where(blocked,1024,C[row,t])*8192+t``.

    Args (unbatched view — the env-batch vmap routes to the Pallas kernel):
      rowidx:   [R] int32, flattened row index ``g*T + cur`` into cost_pad
      blocked:  [T] bool, targets the expert must skip
      cost_pad: [GT, FOLD, Tp/FOLD] bf16 operand from :func:`pad_cost_rows`
    Returns [R] f32 packed minima (decode: ``loc = m % 8192``,
    ``unreachable = (m - loc)/8192 >= MAX_COST``).
    """
    return _rowmin_xla(rowidx, blocked, cost_pad)


def _rowmin_xla(rowidx, blocked, cost_pad):
    """Reference XLA path (unbatched or non-TPU): gather rows, fused reduce.
    Identical arithmetic to the kernel — integers < 2^24, exact in f32."""
    T = blocked.shape[-1]
    rows = cost_pad[rowidx]  # [..., R, FOLD, L] (gather first: rows are small)
    rows = rows.reshape(rows.shape[:-2] + (-1,))[..., :T].astype(jnp.float32)
    idx = jnp.arange(T, dtype=jnp.float32)
    packed = (
        jnp.where(blocked[..., None, :], _BLOCKED, rows) * _MULT + idx
    )
    return jnp.min(packed, axis=-1)


@packed_greedy_min.def_vmap
def _packed_greedy_min_vmap(axis_size, in_batched, rowidx, blocked, cost_pad):
    rb, bb, cb = in_batched
    if cb or not (rb and bb):
        # batched bank (or partial batching) — no kernel route; vmap the
        # XLA path manually (custom_vmap gives us the full batched args)
        res = jax.vmap(
            _rowmin_xla,
            in_axes=(0 if rb else None, 0 if bb else None, 0 if cb else None),
        )(rowidx, blocked, cost_pad)
        return res, True
    from gym_flock_tpu.ops.pallas_flocking import mosaic_supported

    if not mosaic_supported():
        return jax.vmap(_rowmin_xla, in_axes=(0, 0, None))(
            rowidx, blocked, cost_pad
        ), True
    return _rowmin_pallas(rowidx, blocked, cost_pad), True


def _rowmin_pallas(rowidx, blocked, cost_pad, interpret: bool = False,
                   ch: int | None = None):
    """Whole-batch kernel launch: grid (B, R/CH).

    ``ch=None`` (the production route) auto-sizes the chunk: whole-R
    chunks avoid padding-row DMAs entirely (measured best at R=100:
    ch=100 reads exactly B*R rows; ch=64 pads to 128 rows/env); very
    large R falls back to CH_ROWS-sized chunks.  An explicit ``ch`` is
    honored as-is (benchmark sweeps)."""
    B, R = rowidx.shape
    GT, F, L = cost_pad.shape
    Tp = F * L
    T = blocked.shape[-1]
    if ch is None:
        ch = R if R <= 128 else CH_ROWS
    RP = ((R + ch - 1) // ch) * ch
    if RP != R:
        rowidx = jnp.pad(rowidx, ((0, 0), (0, RP - R)))
    # f32 blocked, folded like the operand, pads forced to 1.0 (blocked)
    bf = jnp.pad(
        blocked.astype(jnp.float32), ((0, 0), (0, Tp - T)), constant_values=1.0
    ).reshape(B, F, L)

    from jax.experimental.pallas import tpu as pltpu

    def row_spec(i):
        # index map returns BLOCK indices; block (1, F, L) => block row ==
        # array row, so the prefetched table IS the block index
        return pl.BlockSpec(
            (1, F, L), lambda b, j, rows_, i=i: (rows_[b, j * ch + i], 0, 0)
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, RP // ch),
        in_specs=[pl.BlockSpec((1, F, L), lambda b, j, rows_: (b, 0, 0))]
        + [row_spec(i) for i in range(ch)],
        # one (1, 1, RP) block per env, written piecewise across j (the
        # block index is j-invariant, so it stays VMEM-resident per b)
        out_specs=pl.BlockSpec((1, 1, RP), lambda b, j, rows_: (b, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_rowmin_kernel, ch=ch),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, 1, RP), jnp.float32),
        interpret=interpret,
    )(rowidx, bf, *([cost_pad] * ch))
    return out[:, 0, :R]


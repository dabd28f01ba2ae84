"""Blockwise Pallas kernels for large-N flocking pairwise interactions.

The XLA path (``gym_flock_tpu.envs.flocking``) materializes [N, N] channel
arrays; at swarm sizes N >~ 1k with large env batches those intermediates
(and, for GNN aggregation, the adjacency itself — 1 GB at N=16k) live in
HBM.  These kernels keep everything tile-resident:

* :func:`flocking_sums` — every per-agent neighbor reduction of the flocking
  family in one pass: the 6 observation feature sums of ``compute_helpers``
  (reference flocking_relative.py:124-128), the Turner potential-gradient
  sums of ``controller`` (:204-226), and the neighbor degree.  HBM traffic
  O(N) instead of O(N^2).

  MEASURED ROUTING (v5e, fetch-amortized, best-of-5): the default
  ``impl="pallas"`` blockwise kernel wins decisively on BATCHED inputs —
  53.4 vs 26.9 Gpair/s at N=8192/B=8 (the native batch grid dimension;
  XLA's reduce fusion degrades under a leading batch axis) — and ties
  single-env (43.0 vs 43.6 at N=16384/B=1).  ``impl="xla"`` is a fused
  dense formulation with an iota diagonal mask: XLA's multi-output reduce
  fusion keeps the [.., N, N] domain unmaterialized (O(N) memory, verified
  by an N=16384 run that would otherwise need tens of GB).  Single-shot
  per-call fetch timing is meaningless on the remote-attached chip — the
  tunnel round trip (~20-40 ms) swamps the ~2-6 ms kernel; chain calls
  inside one jit (see benchmarks/large_flocking_bench.py).
* :func:`adjacency_matmul` — (A(x) @ H) with the radius-graph adjacency
  generated on the fly per [BI, BJ] tile and fed straight to the MXU; A
  never exists in HBM.  :func:`khop_aggregate` builds the AggregationGNN
  input pipeline [X, AX, A^2X, ...] on top.

Both use a 2-D (i, j) grid with the j (neighbor-block) axis innermost and
accumulate into a revisited output block — inputs are streamed from HBM in
(block, 1)/(1, block) tiles so VMEM stays bounded regardless of N or the
vmapped batch size.

Channel layout of the [N, 16] outputs (padding zeros):
  0: sum adj*dvx        1: sum adj*dx/r^4   2: sum adj*dx/r^2
  3: sum adj*dvy        4: sum adj*dy/r^4   5: sum adj*dy/r^2
  6: sum grad_x         7: sum grad_y       8: degree (sum adj)
  -- channels below only with ``channels="full"`` (zeros in the pure-sum
     "core" set, which accumulates with a plain add and is measurably
     faster — ``flocking_sums`` computes core) --
  9: min r^2 (combine across blocks with ``min``; the sharded reset's
     min-distance acceptance test, reference flocking_relative.py:164)
  10: sum adj*grad_x    11: sum adj*grad_y  (decentralized expert's
     adjacency-masked gradient sums, reference flocking_relative.py:201-207)

:func:`flocking_sums_block` is the cross-block form — row agents against a
*different* column block, with global-index offsets for the diagonal mask —
the per-ring-step tile of the agent-axis-sharded kernels
(``parallel.agent_shard``); the symmetric :func:`flocking_sums` delegates to
it with both operands the same block and zero offsets.

adj = r^2 < comm_radius^2 off-diagonal; grad uses the reference's quirky
cutoff r^2 > comm_radius (NOT squared; flocking_relative.py:225).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def mosaic_supported() -> bool:
    """Compiled Mosaic (Pallas) lowers only on TPU backends; every auto
    route and interpret default in this package gates on this so GPU and
    CPU backends take the XLA / interpreter paths unmodified."""
    return jax.default_backend() == "tpu"


__all__ = [
    "flocking_sums",
    "flocking_sums_block",
    "adjacency_matmul_block",
    "turner_controller_large",
    "flocking_features_large",
    "flocking_sums_batched",
    "adjacency_matmul",
    "khop_aggregate",
]

N_OUT = 16
_PAD_POS = 1.0e15  # padding agents parked far away: adj=0, grads cut off


def _round_up(x, m):
    return ((x + m - 1) // m) * m


# =============================================================================
# flocking_sums
# =============================================================================


def _flocking_sums_xla(x: jax.Array, comm_radius, comm_radius2, channels="core"):
    """Fused dense formulation of the flocking channel sums (module
    docstring layout).  Every [.., N, N] intermediate is an elementwise
    producer of the final multi-output reduction, so XLA fuses the whole
    pass into one traversal of the pair domain — nothing O(N^2) reaches
    HBM (the diagonal mask is an iota equality, NOT ``jnp.eye``, which
    would materialize [N, N] and measures 16% slower at N=16k).

    Accepts [N, 4] or any leading batch dims; vmap is native (no
    custom_vmap needed on this path)."""
    dtype = x.dtype
    n = x.shape[-2]
    px, py, vx, vy = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    dx = px[..., :, None] - px[..., None, :]
    dy = py[..., :, None] - py[..., None, :]
    dvx = vx[..., :, None] - vx[..., None, :]
    dvy = vy[..., :, None] - vy[..., None, :]
    r2 = dx * dx + dy * dy
    eye = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) == jax.lax.broadcasted_iota(
        jnp.int32, (n, n), 1
    )
    r2 = jnp.where(eye, jnp.inf, r2)
    adj = (r2 < comm_radius2).astype(dtype)
    inv = 1.0 / r2
    inv2 = inv * inv
    gfac = jnp.where(r2 > comm_radius, 0.0, 2.0 * inv * (1.0 - inv))
    chans = [
        jnp.sum(dvx * adj, axis=-1),
        jnp.sum(dx * inv2 * adj, axis=-1),
        jnp.sum(dx * inv * adj, axis=-1),
        jnp.sum(dvy * adj, axis=-1),
        jnp.sum(dy * inv2 * adj, axis=-1),
        jnp.sum(dy * inv * adj, axis=-1),
        jnp.sum(dx * gfac, axis=-1),
        jnp.sum(dy * gfac, axis=-1),
        jnp.sum(adj, axis=-1),
    ]
    if channels == "full":
        chans += [
            jnp.min(r2, axis=-1),
            jnp.sum(dx * gfac * adj, axis=-1),
            jnp.sum(dy * gfac * adj, axis=-1),
        ]
    out = jnp.stack(chans, axis=-1)
    pad = jnp.zeros(out.shape[:-1] + (N_OUT - len(chans),), dtype)
    return jnp.concatenate([out, pad], axis=-1)


def _flocking_sums_impl(x: jax.Array, comm_radius, comm_radius2, interpret: bool = False):
    """Symmetric (all-pairs-of-one-swarm) case: the cross-block kernel with
    both operands the same block and zero global-index offsets (the id
    equality then masks exactly the diagonal).  Uses the pure-sum core
    channel set — the hot FlockingLarge path pays nothing for the sharded
    schedule's min/masked channels (channels 9..11 read as zeros)."""
    offs = jnp.zeros((2,), jnp.int32)
    return _block_sums_impl(
        x, x, offs, comm_radius, comm_radius2, interpret=interpret, channels="core"
    )


@functools.partial(jax.custom_batching.custom_vmap)
def _flocking_sums_vmappable(x, scal):
    return _flocking_sums_impl(x, scal[0], scal[1])


@_flocking_sums_vmappable.def_vmap
def _flocking_sums_vmap_rule(axis_size, in_batched, x, scal):
    # route vmap to the native batch grid dimension: one pallas_call, one
    # compile — vmapping the pallas_call itself builds axis_size Mosaic
    # programs and compiles pathologically at large N
    x_b, scal_b = in_batched
    assert not scal_b, "vmap over radii unsupported; close over them instead"
    if x.ndim == 2 or not x_b:
        out = _flocking_sums_impl(x, scal[0], scal[1])
        return out, False
    if x.ndim > 3:
        # vmap over an already-batched call: fold, compute, unfold so the
        # leading axis stays the vmapped axis_size
        lead = x.shape[:-2]
        flat = x.reshape((-1,) + x.shape[-2:])
        out = _flocking_sums_impl(flat, scal[0], scal[1])
        return out.reshape(lead + out.shape[1:]), True
    out = _flocking_sums_impl(x, scal[0], scal[1])
    return out, True


@functools.partial(jax.jit, static_argnames=("interpret", "impl"))
def flocking_sums(
    x: jax.Array, comm_radius, comm_radius2, interpret: bool = False,
    impl: str = "auto",
):
    """All per-agent pairwise reductions for flocking, one fused pass.

    x: [N, 4] or [B, N, 4] agent states; returns [N, 16] / [B, N, 16]
    channel sums (layout above).

    ``impl="auto"`` (default) resolves to ``"pallas"`` on TPU and
    ``"xla"`` elsewhere (compiled Pallas kernels only lower on TPU; the
    fused dense formulation runs on any backend, so envs built on this
    kernel work on CPU/GPU unmodified).  ``impl="pallas"``: the blockwise
    VMEM-resident kernel — 2x the XLA path on batched inputs, tied
    single-env (measured landscape in the module docstring); its batch is
    a native leading grid dimension of ONE pallas_call, and a
    ``custom_vmap`` rule routes ``jax.vmap`` of the unbatched form to the
    same program (naively vmapping a pallas_call builds one Mosaic program
    per lane).  ``impl="xla"``: fused dense formulation, also O(N) memory
    via reduce fusion; vmap is native.  ``interpret=True`` forces the
    Pallas interpreter (CPU testing of the kernel path).
    """
    if interpret:
        return _flocking_sums_impl(x, comm_radius, comm_radius2, interpret=True)
    if impl == "auto":
        impl = "pallas" if mosaic_supported() else "xla"
    if impl == "xla":
        return _flocking_sums_xla(x, comm_radius, comm_radius2)
    scal = jnp.asarray(
        [comm_radius, comm_radius2], jnp.result_type(x.dtype)
    )
    return _flocking_sums_vmappable(x, scal)


def flocking_features_large(x: jax.Array, comm_radius, comm_radius2, interpret=False):
    """Large-N replacement for ``flocking_features``: returns
    ``(state_values [N,6], degree [N])`` without materializing [N,N] arrays.
    (The dense adjacency itself is deliberately not produced at this scale;
    consumers should aggregate through :func:`adjacency_matmul` instead.)"""
    s = flocking_sums(x, comm_radius, comm_radius2, interpret=interpret)
    return s[:, 0:6], s[:, 8]


def turner_controller_large(
    x: jax.Array,
    comm_radius,
    comm_radius2,
    action_scalar,
    interpret: bool = False,
    centralized: bool = True,
):
    """Turner expert via the fused kernel (large-N path).

    Centralized: the closed form sum_j (v_i - v_j) = N v_i - sum_j v_j for
    the velocity-consensus term plus the kernel's cutoff-masked gradient
    sums.  Decentralized (reference flocking_relative.py:201-207): both
    terms additionally masked by the adjacency — channels 0/3 and 10/11.
    """
    n = x.shape[0]
    if centralized:
        s = flocking_sums(x, comm_radius, comm_radius2, interpret=interpret)
        s_gx, s_gy = s[:, 6], s[:, 7]
        s_dvx = n * x[:, 2] - jnp.sum(x[:, 2])
        s_dvy = n * x[:, 3] - jnp.sum(x[:, 3])
    else:
        # the masked channels 10/11 exist only in the "full" channel set
        # (flocking_sums computes the cheaper pure-sum core set)
        s = flocking_sums_block(
            x, x, 0, 0, comm_radius, comm_radius2,
            interpret=interpret or not mosaic_supported(),
            channels="full",
        )
        s_gx, s_gy = s[:, 10], s[:, 11]
        s_dvx, s_dvy = s[:, 0], s[:, 3]
    controls = jnp.stack((-s_gx - s_dvx, -s_dvy - s_gy), axis=1)
    return jnp.clip(controls, -10.0, 10.0) / action_scalar


# =============================================================================
# flocking_sums_block: cross-block tile for the agent-sharded ring schedule
# =============================================================================


def _block_sums_kernel(
    scal, offs, px_c, py_c, vx_c, vy_c, px_r, py_r, vx_r, vy_r, out_ref, *, bi, bj,
    channels
):
    # grid = (B, m_i, k_j); offs = (global row offset, global col offset)
    i = pl.program_id(1)
    j = pl.program_id(2)
    comm_radius = scal[0]
    comm_radius2 = scal[1]

    row_ids = offs[0] + i * bi + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 0)
    col_ids = offs[1] + j * bj + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 1)

    dx = px_c[0] - px_r[0]  # [bi,1] - [1,bj] -> [bi,bj]
    dy = py_c[0] - py_r[0]
    dvx = vx_c[0] - vx_r[0]
    dvy = vy_c[0] - vy_r[0]

    r2 = dx * dx + dy * dy
    r2 = jnp.where(row_ids == col_ids, jnp.inf, r2)
    adj = (r2 < comm_radius2).astype(dx.dtype)
    inv = 1.0 / r2
    inv2 = inv * inv
    gfac = jnp.where(r2 > comm_radius, 0.0, 2.0 * inv * (1.0 - inv))

    chans = [
        jnp.sum(dvx * adj, axis=1),
        jnp.sum(dx * inv2 * adj, axis=1),
        jnp.sum(dx * inv * adj, axis=1),
        jnp.sum(dvy * adj, axis=1),
        jnp.sum(dy * inv2 * adj, axis=1),
        jnp.sum(dy * inv * adj, axis=1),
        jnp.sum(dx * gfac, axis=1),
        jnp.sum(dy * gfac, axis=1),
        jnp.sum(adj, axis=1),
    ]
    if channels == "full":
        chans += [
            jnp.min(r2, axis=1),  # channel 9: per-row min r^2
            jnp.sum(dx * gfac * adj, axis=1),  # 10/11: adjacency-masked grad
            jnp.sum(dy * gfac * adj, axis=1),  # sums (decentralized expert)
        ]
    sums = jnp.stack(chans, axis=1)  # [bi, 9 or 12]
    pad = jnp.zeros((bi, N_OUT - len(chans)), dx.dtype)
    block = jnp.concatenate([sums, pad], axis=1)[None]

    @pl.when(j == 0)
    def _():
        out_ref[:] = block

    @pl.when(j > 0)
    def _():
        prev = out_ref[:]
        if channels == "full":
            ch = jax.lax.broadcasted_iota(jnp.int32, prev.shape, 2)
            # channel 9 combines by min, everything else by sum
            out_ref[:] = jnp.where(ch == 9, jnp.minimum(prev, block), prev + block)
        else:
            # pure-sum channel set: plain accumulate (measured 17% faster
            # than the select-merge on the symmetric hot path)
            out_ref[:] = prev + block


def _pad_coords(xb, n_pad, dtype, salt=0.0):
    """Pad positions parked on a far-away ladder: adj/gfac contribute 0.
    ``salt`` (fraction of a ladder rung) displaces one side's ladder so that
    row pads and col pads of DIFFERENT blocks never coincide — a coincident
    pad pair with distinct global ids would have r2=0 and produce
    0 * (-inf) = NaN in discarded rows (poisoning jax_debug_nans runs)."""
    b, n, _ = xb.shape
    pad = n_pad - n
    ppos = jnp.broadcast_to(
        _PAD_POS * (1.0 + salt + jnp.arange(pad, dtype=dtype)), (b, pad)
    )
    px = jnp.concatenate([xb[:, :, 0], ppos], axis=1)
    py = jnp.concatenate([xb[:, :, 1], -ppos], axis=1)
    return px, py


def _pad_block(xb, n_pad, dtype, salt=0.0):
    """Pad full agent states (positions on the far ladder, zero velocities)."""
    b, n, _ = xb.shape
    px, py = _pad_coords(xb, n_pad, dtype, salt)
    zeros = jnp.zeros((b, n_pad - n), dtype)
    vx = jnp.concatenate([xb[:, :, 2], zeros], axis=1)
    vy = jnp.concatenate([xb[:, :, 3], zeros], axis=1)
    return px, py, vx, vy


def _block_sums_impl(
    xr, xc, offs, comm_radius, comm_radius2, interpret=False, vma=None,
    channels="full",
):
    squeeze = xr.ndim == 2
    if squeeze:
        xr, xc = xr[None], xc[None]
    b, m, _ = xr.shape
    k = xc.shape[1]
    dtype = xr.dtype
    bi = 128
    m_pad = _round_up(m, bi)
    bj = min(512, _round_up(k, 128))
    k_pad = _round_up(k, bj)

    px, py, vx, vy = _pad_block(xr, m_pad, dtype)
    qx, qy, wx, wy = _pad_block(xc, k_pad, dtype, salt=0.5)
    cols = [v.reshape(b, m_pad, 1) for v in (px, py, vx, vy)]
    rows = [v.reshape(b, 1, k_pad) for v in (qx, qy, wx, wy)]
    scal = jnp.asarray([comm_radius, comm_radius2], dtype)

    col_spec = pl.BlockSpec((1, bi, 1), lambda bb, i, j, *_: (bb, i, 0))
    row_spec = pl.BlockSpec((1, 1, bj), lambda bb, i, j, *_: (bb, 0, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, m_pad // bi, k_pad // bj),
        in_specs=[col_spec] * 4 + [row_spec] * 4,
        out_specs=pl.BlockSpec((1, bi, N_OUT), lambda bb, i, j, *_: (bb, i, 0)),
    )
    out_shape = (
        jax.ShapeDtypeStruct((b, m_pad, N_OUT), dtype)
        if vma is None
        else jax.ShapeDtypeStruct((b, m_pad, N_OUT), dtype, vma=frozenset(vma))
    )
    out = pl.pallas_call(
        functools.partial(_block_sums_kernel, bi=bi, bj=bj, channels=channels),
        grid_spec=grid_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(scal, offs, *cols, *rows)
    out = out[:, :m]
    return out[0] if squeeze else out


def _make_block_sums_vmappable(vma, channels):
    kw = dict(vma=vma, channels=channels)

    @jax.custom_batching.custom_vmap
    def _block_sums_vmappable(xr, xc, offs, scal):
        return _block_sums_impl(xr, xc, offs, scal[0], scal[1], **kw)


    @_block_sums_vmappable.def_vmap
    def _block_sums_vmap_rule(axis_size, in_batched, xr, xc, offs, scal):
        # route vmap to the native batch grid dimension (see _flocking_sums_vmap_rule)
        xr_b, xc_b, offs_b, scal_b = in_batched
        assert not scal_b and not offs_b, "vmap over radii/offsets unsupported"
        if not (xr_b or xc_b):
            return _block_sums_impl(xr, xc, offs, scal[0], scal[1], **kw), False
        if not xr_b:
            xr = jnp.broadcast_to(xr[None], (axis_size,) + xr.shape)
        if not xc_b:
            xc = jnp.broadcast_to(xc[None], (axis_size,) + xc.shape)
        if xr.ndim > 3:
            lead = xr.shape[:-2]
            out = _block_sums_impl(
                xr.reshape((-1,) + xr.shape[-2:]),
                xc.reshape((-1,) + xc.shape[-2:]),
                offs,
                scal[0],
                scal[1],
                **kw,
            )
            return out.reshape(lead + out.shape[1:]), True
        return _block_sums_impl(xr, xc, offs, scal[0], scal[1], **kw), True

    return _block_sums_vmappable


_BLOCK_SUMS_VMAPPABLE_CACHE = {}


def _block_sums_vmappable_for(vma, channels):
    vkey = None if vma is None else frozenset(vma)
    key = (vkey, channels)
    if key not in _BLOCK_SUMS_VMAPPABLE_CACHE:
        _BLOCK_SUMS_VMAPPABLE_CACHE[key] = _make_block_sums_vmappable(vkey, channels)
    return _BLOCK_SUMS_VMAPPABLE_CACHE[key]


def flocking_sums_block(
    xr: jax.Array,
    xc: jax.Array,
    row_offset,
    col_offset,
    comm_radius,
    comm_radius2,
    interpret: bool = False,
    vma=None,
    channels: str = "full",
):
    """Cross-block flocking reductions: row agents ``xr`` [m, 4] (or [B, m, 4])
    against a column block ``xc`` [k, 4], returning [m, 16] channel sums
    (layout in the module docstring; channel 9 combines across blocks with
    ``min``, all others with ``+``).  ``channels="core"`` computes only the
    pure-sum channels 0..8 (plain accumulate — measurably faster; channels
    9..11 read as zeros), ``"full"`` adds min-r2 and the adjacency-masked
    gradient sums.

    ``row_offset``/``col_offset`` are the blocks' global agent indices — the
    self-pair mask of :func:`flocking_sums` becomes a global-id equality
    test, so tiling [row block] x [all column blocks] and combining
    reproduces the full-swarm reductions exactly.  This is the VMEM-resident
    tile of the agent-sharded ring schedule
    (``parallel.agent_shard.flocking_sums_sharded(use_pallas=True)``).
    """
    offs = jnp.asarray([row_offset, col_offset], jnp.int32)
    if interpret:
        return _block_sums_impl(
            xr, xc, offs, comm_radius, comm_radius2, interpret=True, vma=vma,
            channels=channels,
        )
    scal = jnp.asarray([comm_radius, comm_radius2], jnp.result_type(xr.dtype))
    return _block_sums_vmappable_for(vma, channels)(xr, xc, offs, scal)


# =============================================================================
# adjacency_matmul: (A(x) @ H) with A generated on the fly
# =============================================================================


def _adj_matmul_kernel(
    scal, offs, px_c, py_c, px_r, py_r, h_ref, out_ref, deg_ref, *, bi, bj, mean_pool
):
    # grid = (B, m_i, k_j); offs = (global row offset, global col offset)
    i = pl.program_id(1)
    j = pl.program_id(2)
    n_j = pl.num_programs(2)
    cr2 = scal[0]

    row_ids = offs[0] + i * bi + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 0)
    col_ids = offs[1] + j * bj + jax.lax.broadcasted_iota(jnp.int32, (bi, bj), 1)

    dx = px_c[0] - px_r[0]
    dy = py_c[0] - py_r[0]
    r2 = dx * dx + dy * dy
    adj = ((r2 < cr2) & (row_ids != col_ids)).astype(jnp.float32)

    part = jnp.dot(adj, h_ref[0].astype(jnp.float32), preferred_element_type=jnp.float32)[None]
    dpart = jnp.sum(adj, axis=1, keepdims=True)[None]

    @pl.when(j == 0)
    def _():
        out_ref[:] = part
        deg_ref[:] = dpart

    @pl.when(j > 0)
    def _():
        out_ref[:] = out_ref[:] + part
        deg_ref[:] = deg_ref[:] + dpart

    if mean_pool:

        @pl.when(j == n_j - 1)
        def _():
            deg = deg_ref[:]
            deg = jnp.where(deg == 0, 1.0, deg)
            out_ref[:] = out_ref[:] / deg


def _adj_matmul_impl(
    xr, xc, h, offs, comm_radius2, mean_pool=False, interpret=False, vma=None,
    return_deg=False,
):
    """Cross-block (A(xr, xc) @ H_block, degree).  ``xr`` [B?, m, >=2] row
    positions, ``xc``/``h`` [B?, k, ...] column block; ``offs`` global index
    offsets for the self-pair mask.  ``mean_pool`` may only be used for a
    single complete pass (symmetric case) — partial blocks must combine
    out/deg first and normalize after."""
    squeeze = xr.ndim == 2
    if squeeze:
        xr, xc, h = xr[None], xc[None], h[None]
    b, m, _ = xr.shape
    k = xc.shape[1]
    f = h.shape[-1]
    bi = 128
    m_pad = _round_up(m, bi)
    bj = min(512, _round_up(k, 128))
    k_pad = _round_up(k, bj)

    px, py = _pad_coords(xr, m_pad, xr.dtype)
    qx, qy = _pad_coords(xc, k_pad, xc.dtype, salt=0.5)
    hp = jnp.concatenate([h, jnp.zeros((b, k_pad - k, f), h.dtype)], axis=1)
    scal = jnp.asarray([comm_radius2], xr.dtype)

    col_spec = pl.BlockSpec((1, bi, 1), lambda bb, i, j, *_: (bb, i, 0))
    row_spec = pl.BlockSpec((1, 1, bj), lambda bb, i, j, *_: (bb, 0, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, m_pad // bi, k_pad // bj),
        in_specs=[col_spec, col_spec, row_spec, row_spec,
                  pl.BlockSpec((1, bj, f), lambda bb, i, j, *_: (bb, j, 0))],
        out_specs=(
            pl.BlockSpec((1, bi, f), lambda bb, i, j, *_: (bb, i, 0)),
            pl.BlockSpec((1, bi, 1), lambda bb, i, j, *_: (bb, i, 0)),
        ),
    )

    def shape(dims):
        if vma is None:
            return jax.ShapeDtypeStruct(dims, jnp.float32)
        return jax.ShapeDtypeStruct(dims, jnp.float32, vma=frozenset(vma))

    out, deg = pl.pallas_call(
        functools.partial(_adj_matmul_kernel, bi=bi, bj=bj, mean_pool=mean_pool),
        grid_spec=grid_spec,
        out_shape=(shape((b, m_pad, f)), shape((b, m_pad, 1))),
        interpret=interpret,
    )(scal, offs, px.reshape(b, -1, 1), py.reshape(b, -1, 1),
      qx.reshape(b, 1, -1), qy.reshape(b, 1, -1), hp)
    out = out[:, :m].astype(h.dtype)
    deg = deg[:, :m, 0]
    if squeeze:
        out, deg = out[0], deg[0]
    return (out, deg) if return_deg else out


def _zero_offs():
    return jnp.zeros((2,), jnp.int32)


def _make_adj_block_vmappable(vma):
    kw = dict(vma=vma, mean_pool=False, return_deg=True)

    @jax.custom_batching.custom_vmap
    def fn(xr, xc, h, offs, scal):
        return _adj_matmul_impl(xr, xc, h, offs, scal[0], **kw)

    @fn.def_vmap
    def rule(axis_size, in_batched, xr, xc, h, offs, scal):
        xr_b, xc_b, h_b, offs_b, scal_b = in_batched
        assert not scal_b and not offs_b, "vmap over radius/offsets unsupported"
        def bcast(v, batched):
            return v if batched else jnp.broadcast_to(v[None], (axis_size,) + v.shape)
        xr, xc, h = bcast(xr, xr_b), bcast(xc, xc_b), bcast(h, h_b)
        if xr.ndim > 3:
            lead = xr.shape[:-2]
            out, deg = _adj_matmul_impl(
                xr.reshape((-1,) + xr.shape[-2:]),
                xc.reshape((-1,) + xc.shape[-2:]),
                h.reshape((-1,) + h.shape[-2:]),
                offs, scal[0], **kw,
            )
            return (out.reshape(lead + out.shape[1:]),
                    deg.reshape(lead + deg.shape[1:])), (True, True)
        return _adj_matmul_impl(xr, xc, h, offs, scal[0], **kw), (True, True)

    return fn


_ADJ_BLOCK_VMAPPABLE_CACHE = {}


def _adj_block_vmappable_for(vma):
    key = None if vma is None else frozenset(vma)
    if key not in _ADJ_BLOCK_VMAPPABLE_CACHE:
        _ADJ_BLOCK_VMAPPABLE_CACHE[key] = _make_adj_block_vmappable(key)
    return _ADJ_BLOCK_VMAPPABLE_CACHE[key]


def _make_diff_adj_block(vma, interpret):
    """Differentiable cross-block aggregation tile (custom VJP).

    The cross-block adjacency A(xr, xc) is NOT symmetric; its transpose is
    the swapped-operand block A(xc, xr) (global-id masking commutes), so
    dH = A(xc, xr) @ d_out — one more run of the same kernel with operands
    and offsets swapped.  deg = A @ 1 is H-independent: its cotangent
    contributes nothing; positions are a step function of x (zero
    cotangent a.e.); the int offsets get float0 cotangents.
    """

    def kernel(xr, xc, h, offs, scal):
        if interpret:
            return _adj_matmul_impl(
                xr, xc, h, offs, scal[0], mean_pool=False, interpret=True,
                vma=vma, return_deg=True,
            )
        return _adj_block_vmappable_for(vma)(xr, xc, h, offs, scal)

    @jax.custom_vjp
    def f(xr, xc, h, offs, scal):
        return kernel(xr, xc, h, offs, scal)

    def fwd(xr, xc, h, offs, scal):
        return kernel(xr, xc, h, offs, scal), (xr, xc, offs, scal)

    def bwd(res, cts):
        xr, xc, offs, scal = res
        d_out, _d_deg = cts
        dh, _ = kernel(xc, xr, d_out, offs[::-1], scal)
        f0 = np.zeros(offs.shape, jax.dtypes.float0)
        return (
            jnp.zeros_like(xr),
            jnp.zeros_like(xc),
            dh,
            f0,
            jnp.zeros_like(scal),
        )

    f.defvjp(fwd, bwd)
    return f


_DIFF_ADJ_BLOCK_CACHE = {}


def _diff_adj_block_for(vma, interpret):
    key = (None if vma is None else frozenset(vma), interpret)
    if key not in _DIFF_ADJ_BLOCK_CACHE:
        _DIFF_ADJ_BLOCK_CACHE[key] = _make_diff_adj_block(key[0], interpret)
    return _DIFF_ADJ_BLOCK_CACHE[key]


def adjacency_matmul_block(
    xr: jax.Array,
    xc: jax.Array,
    h: jax.Array,
    row_offset,
    col_offset,
    comm_radius2,
    interpret: bool = False,
    vma=None,
):
    """Partial GNN aggregation tile for the agent-sharded ring schedule:
    ``(A(xr, xc) @ H_block, degree)`` with the [m, k] adjacency tile built
    from positions in VMEM and contracted on the MXU.  Combine partials by
    summing both outputs across column blocks, then mean-pool normalize —
    see ``parallel.agent_shard.adjacency_matmul_sharded(use_pallas=True)``.
    Differentiable in ``h`` via a custom VJP (the transposed tile is the
    swapped-operand block), so the sharded GNN aggregation trains."""
    offs = jnp.asarray([row_offset, col_offset], jnp.int32)
    scal = jnp.asarray([comm_radius2], jnp.result_type(xr.dtype))
    return _diff_adj_block_for(vma, interpret)(xr, xc, h, offs, scal)


def _make_diff_adj_matmul(mean_pool: bool, interpret: bool):
    """Differentiable (A(x) @ H) with a custom VJP.

    Pallas kernels have no automatic gradients; the math here is closed
    form: the radius adjacency A is SYMMETRIC and binary, and its
    dependence on positions is a step function (zero gradient a.e. — the
    position cotangent is zeros, matching what autodiff of a dense
    ``(r2 < cr2).astype(f32)`` adjacency would produce).  For
    y = A H:            dH = A dy.
    For y = (A H)/deg:  dH = A (dy / deg)     (deg is H-independent).
    Each backward pass is one more run of the same kernel.
    """

    def kernel(x, h, scal):
        if interpret:
            return _adj_matmul_impl(
                x, x, h, _zero_offs(), scal[0], mean_pool=False,
                interpret=True, return_deg=True,
            )
        return _adj_block_vmappable_for(None)(x, x, h, _zero_offs(), scal)

    @jax.custom_vjp
    def f(x, h, scal):
        out, deg = kernel(x, h, scal)
        if not mean_pool:
            return out
        return out / jnp.where(deg == 0, 1.0, deg)[..., None].astype(out.dtype)

    def fwd(x, h, scal):
        out, deg = kernel(x, h, scal)
        degc = jnp.where(deg == 0, 1.0, deg)[..., None].astype(out.dtype)
        if not mean_pool:
            return out, (x, scal)
        return out / degc, (x, scal, degc)

    def bwd_sum(res, dy):
        x, scal = res
        dh, _ = kernel(x, dy, scal)
        return jnp.zeros_like(x), dh, jnp.zeros_like(scal)

    def bwd_mean(res, dy):
        x, scal, degc = res
        dh, _ = kernel(x, dy / degc, scal)
        return jnp.zeros_like(x), dh, jnp.zeros_like(scal)

    f.defvjp(fwd, bwd_mean if mean_pool else bwd_sum)
    return f


_DIFF_ADJ_CACHE = {}


def _diff_adj_matmul_for(mean_pool: bool, interpret: bool):
    key = (mean_pool, interpret)
    if key not in _DIFF_ADJ_CACHE:
        _DIFF_ADJ_CACHE[key] = _make_diff_adj_matmul(mean_pool, interpret)
    return _DIFF_ADJ_CACHE[key]


@functools.partial(jax.jit, static_argnames=("mean_pool", "interpret"))
def adjacency_matmul(
    x: jax.Array,
    h: jax.Array,
    comm_radius2,
    mean_pool: bool = True,
    interpret: bool = False,
):
    """(A(x) @ H), generating the radius-graph adjacency on the fly per tile.

    The GNN aggregation primitive for large swarms: each [BI, BJ] adjacency
    tile is computed from positions in VMEM and fed straight into an MXU
    matmul against the matching H tile — A never exists in HBM.  At N=16k a
    dense A is 1 GB per env instance; this kernel's footprint is O(N*F).
    With ``mean_pool`` rows are degree-normalized exactly like
    ``mean_pool_normalize`` (reference flocking_relative.py:120-122).

    Accepts [N, *] or batched [B, N, *] inputs; the batch is a native grid
    dimension and a ``custom_vmap`` rule routes ``jax.vmap`` to it (one
    compile at any batch size).  DIFFERENTIABLE in ``h`` via a custom VJP
    (one extra kernel pass; positions get the a.e.-correct zero cotangent)
    — large-swarm GNNs train through it (``models.LargeAggregationGNN``).
    """
    # compiled Pallas only lowers on TPU; fall back to the interpreter off
    # it so large-env models run (slowly) on CPU/GPU unmodified
    interpret = interpret or not mosaic_supported()
    scal = jnp.asarray([comm_radius2], jnp.result_type(x.dtype))
    return _diff_adj_matmul_for(mean_pool, interpret)(x, h, scal)


def khop_aggregate(
    x: jax.Array,
    features: jax.Array,
    comm_radius2,
    k_hops: int,
    mean_pool: bool = True,
    interpret: bool = False,
):
    """[X, AX, A^2 X, ...] concatenated — the AggregationGNN input pipeline
    for large N, built on :func:`adjacency_matmul` (A is never materialized).
    """
    zs = [features]
    z = features
    for _ in range(k_hops - 1):
        z = adjacency_matmul(x, z, comm_radius2, mean_pool=mean_pool, interpret=interpret)
        zs.append(z)
    return jnp.concatenate(zs, axis=-1)


def flocking_sums_batched(
    xs: jax.Array, comm_radius, comm_radius2, interpret: bool = False
):
    """Batched :func:`flocking_sums` — the batch is a native grid dimension
    (one compile for any B; see :func:`flocking_sums`).  Kept as an explicit
    name; identical to calling ``flocking_sums`` with a [B, N, 4] input."""
    return flocking_sums(xs, comm_radius, comm_radius2, interpret=interpret)

"""O1 — voxelization / pillarization (SURVEY.md §2.3 O1).

Reference form: CUDA point->voxel hash with a dynamic number of voxels.
TPU-native design: **sort-then-spread** into *fixed budgets*
(``max_voxels`` cells x ``max_points_per_voxel`` points), deterministic
(points bin in (cell_id, point_index) order, so overflow beyond either
budget drops reproducibly).

Round-2 rework, driven by the measured ~2 GB/s XLA scatter/gather
ceiling (benchmarks/profile_scatter.py):

  1. ONE multi-operand ``lax.sort`` co-sorts (cell, index, channels) —
     no argsort + take_along_axis (gathers pay the same ceiling).
  2. Segment ranks come from cumsum / running-max scans (cheap on
     scalar channels).
  3. Each kept point's flat slot ``rank * K + within_rank`` is unique
     and strictly increasing, so filling the (P, K, C) buffer is a pure
     SPREAD — done by the Pallas slab-paint kernel
     (ops/pallas/pillar_paint.py) whose sum-reduction over unique
     targets is an exact selection. Per-voxel counts and [z, y, x]
     coords ride along as extra channels (coords stored +1 so empty
     rows decode to -1), eliminating their scatters too.
  4. ``point_voxel`` (original point order) comes from an inverse
     2-operand co-sort, not a scatter.

The driver metric "voxelization GB/s" (BASELINE.json:2) is measured on
this op by ``bench.py``/``benchmarks/``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

LANES_MAX = 128


class VoxelizationResult(NamedTuple):
    """Fixed-shape voxelization output (leading batch axis optional).

    voxels:      (..., P, K, C) point features grouped per cell (zero padded)
    coords:      (..., P, 3) int32 cell coords ([z, y, x]); -1 where invalid
    num_points:  (..., P) int32 valid points in each cell
    num_voxels:  (...,) int32 number of valid cells (<= P)
    point_voxel: (..., N) int32 index of the voxel each point landed in,
                 -1 if the point was dropped (out of range / overflow)
    """

    voxels: jax.Array
    coords: jax.Array
    num_points: jax.Array
    num_voxels: jax.Array
    point_voxel: jax.Array


def point_cell_ids(
    points: jax.Array,
    point_mask: jax.Array,
    pc_range: Tuple[float, ...],
    voxel_size: Tuple[float, ...],
    grid_size: Tuple[int, int, int],
) -> Tuple[jax.Array, jax.Array]:
    """Map each point to a linearized grid cell id.

    Returns (cell_id (..., N) int32, in_range (..., N) bool).
    Out-of-range or masked points get cell_id = num_cells (a sentinel
    that sorts last).
    """
    nx, ny, nz = grid_size
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    ix = jnp.floor((x - pc_range[0]) / voxel_size[0]).astype(jnp.int32)
    iy = jnp.floor((y - pc_range[1]) / voxel_size[1]).astype(jnp.int32)
    iz = jnp.floor((z - pc_range[2]) / voxel_size[2]).astype(jnp.int32)
    in_range = (
        (ix >= 0) & (ix < nx)
        & (iy >= 0) & (iy < ny)
        & (iz >= 0) & (iz < nz)
        & point_mask.astype(bool)
    )
    num_cells = nx * ny * nz
    # Linear id in (z, y, x) order: id = (iz * ny + iy) * nx + ix.
    cell = (iz * ny + iy) * nx + ix
    cell = jnp.where(in_range, cell, num_cells)
    return cell, in_range


@partial(jax.jit, static_argnames=(
    "pc_range", "voxel_size", "grid_size", "max_voxels",
    "max_points_per_voxel"))
def voxelize_batch(
    points: jax.Array,
    point_mask: jax.Array,
    *,
    pc_range: Tuple[float, ...],
    voxel_size: Tuple[float, ...],
    grid_size: Tuple[int, int, int],
    max_voxels: int,
    max_points_per_voxel: int,
) -> VoxelizationResult:
    """Deterministic fixed-budget voxelization of a batch of clouds.

    Args:
      points: (B, N, C) float — first 3 channels are x, y, z.
      point_mask: (B, N) bool/int — valid-point mask (padding = 0).

    Voxel order is ascending cell id. Overflow policy: points beyond K
    per cell drop in point-index order; cells beyond P drop in cell-id
    order.
    """
    from lisec_tpu.ops.pallas.pillar_paint import segment_paint

    b, n, c = points.shape
    kk = max_points_per_voxel
    nx, ny, _ = grid_size[0], grid_size[1], grid_size[2]
    num_cells = grid_size[0] * grid_size[1] * grid_size[2]
    # Slot packing stores C point channels + count + 3 coords in a
    # record of 8 lanes (C <= 4, 16 slots/row) or 16 lanes (C <= 12,
    # 8 slots/row).
    if c + 4 > 16:
        raise ValueError(
            f"voxelize supports at most 12 point channels, got {c}")
    rw = 8 if c + 4 <= 8 else 16        # record width in lanes
    spr = 128 // rw                     # slots packed per table row

    cell, _ = point_cell_ids(points, point_mask, pc_range, voxel_size,
                             grid_size)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))

    # One co-sort: (cell, original index) keys make it deterministic;
    # the point channels ride along (no argsort+gather).
    sorted_ops = jax.lax.sort(
        (cell, idx) + tuple(points[..., j] for j in range(c)),
        dimension=1, num_keys=2)
    cell_s, idx_s = sorted_ops[0], sorted_ops[1]
    pts_s = jnp.stack(sorted_ops[2:], axis=-1)          # (B, N, C)
    valid_s = cell_s < num_cells

    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, cell_s.dtype), cell_s[:, :-1]], axis=1)
    is_start = (cell_s != prev) & valid_s
    voxel_rank = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
    num_voxels_total = jnp.where(
        valid_s.any(axis=1), voxel_rank[:, -1] + 1, 0)
    num_voxels = jnp.minimum(num_voxels_total, max_voxels)

    pos = idx  # 0..n-1 per row
    start_idx = jnp.where(is_start, pos, 0)
    seg_start = jax.lax.associative_scan(
        jnp.maximum, start_idx, axis=1)                 # running max
    within = pos - seg_start

    keep = valid_s & (voxel_rank < max_voxels) & (within < kk)
    slot = voxel_rank * kk + within                     # strictly increasing

    # Per-point record: [point C.. | count | coords+1 | pad] (+1 so
    # empty rows decode to -1 after the subtraction).
    cell_clip = jnp.minimum(cell_s, num_cells - 1)
    cz = (cell_clip // (nx * ny)).astype(jnp.float32)
    cy = ((cell_clip // nx) % ny).astype(jnp.float32)
    cx = (cell_clip % nx).astype(jnp.float32)
    ones = jnp.ones((b, n), jnp.float32)
    rec = jnp.concatenate(
        [pts_s.astype(jnp.float32),
         jnp.stack([ones, cz + 1, cy + 1, cx + 1], axis=-1),
         jnp.zeros((b, n, rw - c - 4), jnp.float32)], axis=-1)  # (B,N,rw)

    # Pack `spr` slots per 128-lane table row: each point's record goes
    # to lane offset rw*(slot % spr) (a cheap outer product — slots are
    # unique, so lane-disjoint SUM routing reconstructs them exactly).
    # A 128-lane row per slot would write a much larger table (measured:
    # the table I/O dominated the whole op).
    total_slots = max_voxels * kk
    num_rows = -(-total_slots // spr)
    sub = jax.nn.one_hot(slot % spr, spr, dtype=jnp.float32)  # (B,N,spr)
    packed = (sub[..., :, None] * rec[..., None, :]).reshape(b, n, 128)
    # segment_paint's slab offsets assume the row stream is ASCENDING,
    # so dropped points must NOT get an out-of-band sentinel row (that
    # would truncate every later slab's range). Zero their packed
    # record and give them the CLAMPED slot's row — identical to
    # slot // spr for kept points, and ascending for dropped ones
    # (rank is monotone; within clamps to its own voxel's last slot) —
    # a zero sum lands harmlessly on a real row, no scan needed.
    packed = jnp.where(keep[..., None], packed, 0.0)
    slot_c = (jnp.clip(voxel_rank, 0, max_voxels - 1) * kk
              + jnp.minimum(within, kk - 1))
    row = slot_c // spr

    window = 512    # segment_paint pads N to a window multiple
    interpret = jax.devices()[0].platform != "tpu"
    table = segment_paint(
        packed, row, num_cells=num_rows,
        num_max=0, count_channel=127, slab=2048, window=window,
        interpret=interpret)                      # (B, ~P*K/spr, 128)
    table = table.reshape(b, num_rows * spr, rw)[:, :total_slots]
    table = table.reshape(b, max_voxels, kk, rw)

    voxels = table[..., :c].astype(points.dtype)        # (B, P, K, C)
    num_points = jnp.round(
        jnp.sum(table[..., c], axis=-1)).astype(jnp.int32)
    # Slot 0 is always filled for non-empty voxels (within-rank 0).
    coords = (table[:, :, 0, c + 1:c + 4] - 1.0).astype(jnp.int32)

    # point_voxel in ORIGINAL point order: invert the sort with a
    # 2-operand co-sort on the carried original indices (no scatter).
    pv_sorted = jnp.where(keep, voxel_rank, -1)
    _, point_voxel = jax.lax.sort(
        (idx_s, pv_sorted), dimension=1, num_keys=1)

    return VoxelizationResult(voxels, coords, num_points, num_voxels,
                              point_voxel)


class VoxelizeMeanResult(NamedTuple):
    """Fused voxelize + mean-VFE output (SECOND's front end).

    feats:      (..., P, C) per-voxel MEAN of the <=K kept points
    coords:     (..., P, 3) int32 cell coords ([z, y, x]); -1 where invalid
    num_points: (..., P) int32 kept points per cell (<= K)
    num_voxels: (...,) int32 number of valid cells (<= P)
    """

    feats: jax.Array
    coords: jax.Array
    num_points: jax.Array
    num_voxels: jax.Array


@partial(jax.jit, static_argnames=(
    "pc_range", "voxel_size", "grid_size", "max_voxels",
    "max_points_per_voxel"))
def voxelize_mean_batch(
    points: jax.Array,
    point_mask: jax.Array,
    *,
    pc_range: Tuple[float, ...],
    voxel_size: Tuple[float, ...],
    grid_size: Tuple[int, int, int],
    max_voxels: int,
    max_points_per_voxel: int,
) -> VoxelizeMeanResult:
    """Voxelize + mean-VFE in ONE paint, never materializing (P, K, C).

    Exactly ``mean_vfe(voxelize_batch(...))`` (same budgets, same
    deterministic overflow policy — the mean is over the first K points
    per cell in point-index order), but the paint target is keyed by
    VOXEL RANK directly: each point contributes an 8-lane record
    ``[x, y, z, r.. | count=1 | coords+1 (segment starts only)]`` that
    segment-SUMS into a (P, 8) table — ~K*16x less table I/O than the
    slot-packed (P*K/16, 128) layout (round-4 attribution showed that
    OUTPUT amplification, 98 MB for a 16.8 MB input, bounded the
    whole op; VERDICT r4 #4 / ROUND4_NOTES "Voxelize attribution").
    """
    from lisec_tpu.ops.pallas.pillar_paint import segment_paint

    b, n, c = points.shape
    kk = max_points_per_voxel
    nx, ny = grid_size[0], grid_size[1]
    num_cells = grid_size[0] * grid_size[1] * grid_size[2]
    rw = -(-(c + 4) // 8) * 8           # record width in lanes
    if rw > LANES_MAX:
        raise ValueError(f"too many point channels: {c}")

    cell, _ = point_cell_ids(points, point_mask, pc_range, voxel_size,
                             grid_size)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    sorted_ops = jax.lax.sort(
        (cell, idx) + tuple(points[..., j] for j in range(c)),
        dimension=1, num_keys=2)
    cell_s = sorted_ops[0]
    pts_s = jnp.stack(sorted_ops[2:], axis=-1)          # (B, N, C)
    valid_s = cell_s < num_cells

    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, cell_s.dtype), cell_s[:, :-1]], axis=1)
    is_start = (cell_s != prev) & valid_s
    voxel_rank = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
    num_voxels_total = jnp.where(
        valid_s.any(axis=1), voxel_rank[:, -1] + 1, 0)
    num_voxels = jnp.minimum(num_voxels_total, max_voxels)

    pos = idx
    start_idx = jnp.where(is_start, pos, 0)
    seg_start = jax.lax.associative_scan(
        jnp.maximum, start_idx, axis=1)
    within = pos - seg_start
    keep = valid_s & (voxel_rank < max_voxels) & (within < kk)

    cell_clip = jnp.minimum(cell_s, num_cells - 1)
    cz = (cell_clip // (nx * ny)).astype(jnp.float32)
    cy = ((cell_clip // nx) % ny).astype(jnp.float32)
    cx = (cell_clip % nx).astype(jnp.float32)
    # Coords ride on the SEGMENT-START point only, so the per-cell sum
    # holds one copy (+1-shifted: an empty cell's 0 decodes to -1).
    sf = is_start.astype(jnp.float32)
    rec = jnp.concatenate(
        [pts_s.astype(jnp.float32),
         jnp.stack([jnp.ones((b, n), jnp.float32),
                    sf * (cz + 1), sf * (cy + 1), sf * (cx + 1)],
                   axis=-1),
         jnp.zeros((b, n, rw - c - 4), jnp.float32)], axis=-1)
    rec = jnp.where(keep[..., None], rec, 0.0)
    # Paint stream: the voxel rank itself (ascending by construction;
    # over-K points keep their rank with a zero record, dropped cells /
    # invalid points get the sentinel row).
    stream = jnp.where(valid_s & (voxel_rank < max_voxels),
                       voxel_rank, max_voxels)

    interpret = jax.devices()[0].platform != "tpu"
    table = segment_paint(
        rec, stream, num_cells=max_voxels,
        num_max=0, count_channel=c, slab=2048, window=512,
        interpret=interpret)                            # (B, P, rw)

    cnt = table[..., c]
    num_points = jnp.round(cnt).astype(jnp.int32)
    feats = (table[..., :c]
             / jnp.maximum(cnt, 1.0)[..., None]).astype(points.dtype)
    coords = (jnp.round(table[..., c + 1:c + 4]) - 1.0).astype(jnp.int32)
    return VoxelizeMeanResult(feats, coords, num_points, num_voxels)


@partial(jax.jit, static_argnames=(
    "pc_range", "voxel_size", "grid_size", "max_voxels",
    "max_points_per_voxel"))
def voxelize(
    points: jax.Array,
    point_mask: jax.Array,
    *,
    pc_range: Tuple[float, ...],
    voxel_size: Tuple[float, ...],
    grid_size: Tuple[int, int, int],
    max_voxels: int,
    max_points_per_voxel: int,
) -> VoxelizationResult:
    """Single-cloud wrapper of :func:`voxelize_batch` (points (N, C))."""
    out = voxelize_batch(
        points[None], point_mask[None],
        pc_range=pc_range, voxel_size=voxel_size, grid_size=grid_size,
        max_voxels=max_voxels,
        max_points_per_voxel=max_points_per_voxel)
    return VoxelizationResult(*(x[0] for x in out))

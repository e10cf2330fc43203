"""O1 — voxelization / pillarization (SURVEY.md §2.3 O1).

Reference form: CUDA point->voxel hash with a dynamic number of voxels.
TPU-native design: **two-pass sort-then-segment** into *fixed budgets*
(``max_voxels`` cells x ``max_points_per_voxel`` points), fully
vectorized (one sort + a few scatters — no atomics, no data-dependent
shapes), deterministic: points are binned in (cell_id, point_index)
order, so overflow beyond either budget is dropped reproducibly.

The driver metric "voxelization GB/s" (BASELINE.json:2) is measured on
this op by ``bench.py``/``benchmarks/``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class VoxelizationResult(NamedTuple):
    """Fixed-shape voxelization output.

    voxels:      (P, K, C) point features grouped per cell (zero padded)
    coords:      (P, 3) int32 cell coords (zx_order: [z, y, x]); -1 where invalid
    num_points:  (P,) int32 valid points in each cell
    num_voxels:  () int32 number of valid cells (<= P)
    point_voxel: (N,) int32 index of the voxel each point landed in, -1 if
                 the point was dropped (out of range / overflow)
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

    Returns (cell_id (N,) int32, in_range (N,) bool). Out-of-range or
    masked points get cell_id = num_cells (a sentinel that sorts last).
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
    """Deterministic fixed-budget voxelization of one padded cloud.

    Args:
      points: (N, C) float — first 3 channels are x, y, z.
      point_mask: (N,) bool/int — valid-point mask (padding = 0).

    Algorithm (all static shapes):
      1. cell id per point; invalid -> sentinel.
      2. stable sort point indices by cell id (ties keep point order).
      3. segment boundaries give each cell a dense rank and each point a
         within-cell rank.
      4. scatter points with (cell rank < P, within rank < K) into the
         (P, K, C) buffer.

    Voxel order is ascending cell id (deterministic). Overflow policy:
    points beyond K per cell are dropped in point-index order; cells
    beyond P are dropped in cell-id order.
    """
    n = points.shape[0]
    num_cells = grid_size[0] * grid_size[1] * grid_size[2]
    cell, _ = point_cell_ids(points, point_mask, pc_range, voxel_size, grid_size)

    order = jnp.argsort(cell, stable=True)              # (N,) point indices
    cell_sorted = cell[order]
    valid_sorted = cell_sorted < num_cells

    # Segment starts: first occurrence of each cell id in sorted order.
    prev = jnp.concatenate([jnp.full((1,), -1, cell_sorted.dtype), cell_sorted[:-1]])
    is_start = (cell_sorted != prev) & valid_sorted
    # Dense rank of each point's cell among occupied cells (0-based).
    voxel_rank = jnp.cumsum(is_start.astype(jnp.int32)) - 1      # (N,)
    num_voxels_total = jnp.where(valid_sorted.any(), voxel_rank[-1] + 1, 0)
    num_voxels = jnp.minimum(num_voxels_total, max_voxels)

    # Within-cell rank: position since the segment start.
    idx = jnp.arange(n, dtype=jnp.int32)
    start_idx = jnp.where(is_start, idx, 0)
    seg_start = jax.lax.associative_scan(jnp.maximum, start_idx)  # running max
    within_rank = idx - seg_start

    keep = (
        valid_sorted
        & (voxel_rank < max_voxels)
        & (within_rank < max_points_per_voxel)
    )

    # Scatter sorted points into the fixed buffer. Dropped points go to a
    # trash row (index P) that is sliced off afterwards.
    vr = jnp.where(keep, voxel_rank, max_voxels)
    wr = jnp.where(keep, within_rank, 0)
    buf = jnp.zeros(
        (max_voxels + 1, max_points_per_voxel, points.shape[1]), points.dtype)
    buf = buf.at[vr, wr].set(points[order], mode="drop")
    voxels = buf[:max_voxels]

    counts = jnp.zeros((max_voxels + 1,), jnp.int32)
    counts = counts.at[vr].add(keep.astype(jnp.int32), mode="drop")
    num_points = counts[:max_voxels]

    # Cell coords per voxel: scatter the (z,y,x) decomposition from the
    # segment-start points.
    cell_clip = jnp.minimum(cell_sorted, num_cells - 1)
    nx, ny = grid_size[0], grid_size[1]
    cz = cell_clip // (nx * ny)
    cy = (cell_clip // nx) % ny
    cx = cell_clip % nx
    coords_full = jnp.stack([cz, cy, cx], axis=-1).astype(jnp.int32)  # (N, 3)
    cbuf = jnp.full((max_voxels + 1, 3), -1, jnp.int32)
    cvr = jnp.where(is_start & (voxel_rank < max_voxels), voxel_rank, max_voxels)
    cbuf = cbuf.at[cvr].set(coords_full, mode="drop")
    coords = cbuf[:max_voxels]

    # Per-point voxel assignment (in original point order).
    pv_sorted = jnp.where(keep, voxel_rank, -1)
    point_voxel = jnp.zeros((n,), jnp.int32).at[order].set(pv_sorted)

    return VoxelizationResult(voxels, coords, num_points, num_voxels, point_voxel)

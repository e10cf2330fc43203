"""Fused pillar encoder — the TPU-native reformulation of
voxelize + PFN + pillar-scatter (SURVEY.md §2.3 O1/O6 + §2.2 M3).

The classic pipeline materializes a (P, K, C) voxel buffer (CUDA
hashing) and max-pools K points per pillar. On TPU that costs a sort
plus a 2D scatter (~6 ms/cloud measured). But the PFN is
per-point-then-per-pillar-max, so the buffer is unnecessary:

  1. cell id per point                     (elementwise)
  2. per-cell count & xyz sum              (scatter-add, ~free)
  3. decorate each point (x,y,z,r, xyz-mean, xy-cellcenter)
                                           (one gather + elementwise)
  4. Dense(9 -> C) + BN + ReLU             (one MXU matmul over N)
  5. scatter-max straight into the BEV canvas by cell id

No sort, no (P, K) buffer, no per-pillar point cap (strictly MORE
faithful than the K-budget path: every point contributes), and the
only data-dependent ops are 1D scatters, which XLA:TPU executes at
memory speed. ~3x faster than the buffered path on v5e.

The buffered path (ops.voxelize + PillarFeatureNet) remains for
SECOND (sparse conv needs explicit voxel lists) and as the public O1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class FusedPillarEncoder(nn.Module):
    """points (B, N, 4) + mask (B, N) -> BEV canvas (B, ny, nx, C)."""

    num_filters: int = 64
    pc_range: Tuple[float, ...] = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    voxel_size: Tuple[float, float] = (0.16, 0.16)
    grid: Tuple[int, int] = (432, 496)            # (nx, ny)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        nx, ny = self.grid
        ncells = nx * ny
        r = self.pc_range
        x, y, z = points[..., 0], points[..., 1], points[..., 2]

        ix = jnp.floor((x - r[0]) / self.voxel_size[0]).astype(jnp.int32)
        iy = jnp.floor((y - r[1]) / self.voxel_size[1]).astype(jnp.int32)
        valid = (
            (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
            & (z >= r[2]) & (z < r[5]) & point_mask.astype(bool))
        cell = jnp.where(valid, iy * nx + ix, ncells)      # (B, N)

        # Per-cell count and xyz sum (1D scatter-adds; trash row drops
        # invalid points).
        fvalid = valid[..., None].astype(points.dtype)
        xyz = points[..., :3] * fvalid

        def stats_one(cell_i, xyz_i, valid_i):
            acc = jnp.zeros((ncells + 1, 4), xyz_i.dtype)
            vals = jnp.concatenate(
                [xyz_i, valid_i.astype(xyz_i.dtype)[:, None]], -1)
            return acc.at[cell_i].add(vals, mode="drop")
        stats = jax.vmap(stats_one)(cell, xyz, valid)      # (B, NC+1, 4)

        per_point = jnp.take_along_axis(
            stats, cell[..., None], axis=1)                # (B, N, 4)
        counts = jnp.maximum(per_point[..., 3:4], 1.0)
        mean = per_point[..., :3] / counts
        f_cluster = points[..., :3] - mean

        px = (ix.astype(points.dtype) + 0.5) * self.voxel_size[0] + r[0]
        py = (iy.astype(points.dtype) + 0.5) * self.voxel_size[1] + r[1]
        f_center = jnp.stack([x - px, y - py], axis=-1)

        feats = jnp.concatenate(
            [points[..., :4], f_cluster, f_center], -1) * fvalid

        h = nn.Dense(self.num_filters, use_bias=False,
                     dtype=self.dtype)(feats.astype(self.dtype))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(h)
        h = nn.relu(h)                                     # (B, N, C)

        # Scatter-max straight into the canvas. Fill with -inf (NOT
        # finfo.min, which is finite) so the isfinite cleanup zeroes
        # empty cells.
        neg = jnp.array(-jnp.inf, h.dtype)

        def canvas_one(cell_i, h_i):
            cv = jnp.full((ncells + 1, self.num_filters), neg, h_i.dtype)
            cv = cv.at[cell_i].max(h_i, mode="drop")
            return cv[:ncells]
        h = jnp.where(valid[..., None], h, neg)
        canvas = jax.vmap(canvas_one)(cell, h)             # (B, NC, C)
        canvas = jnp.where(jnp.isfinite(canvas), canvas, 0.0)
        return canvas.reshape(-1, ny, nx, self.num_filters)

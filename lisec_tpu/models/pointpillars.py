"""M3 — PointPillars (SURVEY.md §2.2 M3; config 3, BASELINE.json:9).

Canonical architecture [arch, PAPERS.md:6]: range
[(0,-39.68,-3),(69.12,39.68,1)], pillar 0.16 x 0.16 -> 432 x 496 BEV
grid; 9-channel decorated points (x,y,z,r,xc,yc,zc,xp,yp); PFN =
Linear(9->64)+BN+ReLU+masked max; scatter to canvas; 2D CNN backbone
(3 blocks, stride 2, 64/128/256 ch) + upsample-concat neck (384 ch);
SSD-style anchor head. Everything device-side: the voxelizer output
(fixed budgets) feeds straight into the PFN without leaving HBM.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lisec_tpu.models.common import ConvBNRelu
from lisec_tpu.ops.scatter import pillar_scatter


class PillarFeatureNet(nn.Module):
    """Decorate points with pillar-relative coords and max-pool per pillar.

    Batched: voxels (..., P, K, 4) raw points, coords (..., P, 3)
    [z,y,x], counts (..., P). Output: (..., P, C) pillar features.
    All ops broadcast over leading axes, so one parameter set serves
    the whole batch (a pointwise Dense is the MXU-friendly 1x1 conv).
    """

    num_filters: int = 64
    voxel_size: Tuple[float, float] = (0.16, 0.16)
    pc_range_min: Tuple[float, float] = (0.0, -39.68)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels, coords, num_points, train: bool = False):
        k = voxels.shape[-2]
        mask = (jnp.arange(k) < num_points[..., None])          # (...,P,K)
        fmask = mask[..., None].astype(voxels.dtype)

        xyz = voxels[..., :3]
        counts = jnp.maximum(num_points, 1).astype(voxels.dtype)
        mean = jnp.sum(xyz * fmask, axis=-2) / counts[..., None]
        f_cluster = xyz - mean[..., None, :]                    # xc, yc, zc

        # Offset from the pillar's geometric center in the grid.
        px = (coords[..., 2].astype(voxels.dtype) + 0.5) \
            * self.voxel_size[0] + self.pc_range_min[0]
        py = (coords[..., 1].astype(voxels.dtype) + 0.5) \
            * self.voxel_size[1] + self.pc_range_min[1]
        f_center = jnp.stack(
            [voxels[..., 0] - px[..., None],
             voxels[..., 1] - py[..., None]], axis=-1)          # xp, yp

        feats = jnp.concatenate([voxels, f_cluster, f_center], -1)
        feats = feats * fmask                                   # (...,P,K,9)

        h = nn.Dense(self.num_filters, use_bias=False,
                     dtype=self.dtype)(feats.astype(self.dtype))
        h = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(h)
        h = nn.relu(h)
        neg = jnp.finfo(h.dtype).min
        h = jnp.max(jnp.where(mask[..., None], h, neg), axis=-2)
        return jnp.where(num_points[..., None] > 0, h, 0.0)     # (...,P,C)


class BEVBackbone(nn.Module):
    """3-block strided conv backbone + upsample-concat neck (384 ch)."""

    layer_nums: Sequence[int] = (3, 5, 5)
    strides: Sequence[int] = (2, 2, 2)
    filters: Sequence[int] = (64, 128, 256)
    up_strides: Sequence[int] = (1, 2, 4)
    up_filters: Sequence[int] = (128, 128, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (B, H, W, C) -> (B, H/2, W/2, sum(up_filters))."""
        ups = []
        for i, (n, s, f) in enumerate(
                zip(self.layer_nums, self.strides, self.filters)):
            x = ConvBNRelu(f, kernel=3, stride=s, dtype=self.dtype)(x, train)
            for _ in range(n):
                x = ConvBNRelu(f, kernel=3, dtype=self.dtype)(x, train)
            u = self.up_strides[i]
            if u > 1:
                y = ConvBNRelu(self.up_filters[i], kernel=u, stride=u,
                               transpose=True, dtype=self.dtype)(x, train)
            else:
                y = ConvBNRelu(self.up_filters[i], kernel=3, dtype=self.dtype)(x, train)
            ups.append(y)
        return jnp.concatenate(ups, axis=-1)


class AnchorHead(nn.Module):
    """SSD-style 1x1 conv head: class logits, box deltas, direction.

    Anchor order within a cell is the last axis, so flattening
    (H, W, A) matches the anchor generator's (y, x, anchor) layout.
    """

    num_classes: int
    num_anchors_per_cell: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = self.num_anchors_per_cell
        # Focal-loss prior init (RetinaNet recipe, used by PointPillars/
        # SECOND): bias = -log((1-pi)/pi), pi=0.01, so an untrained head
        # predicts the foreground prior instead of p=0.5 — stabilizes
        # early focal-loss training (and keeps greedy NMS's early-exit
        # behavior representative of a trained detector).
        cls = nn.Conv(a * self.num_classes, (1, 1), dtype=self.dtype,
                      bias_init=nn.initializers.constant(-4.595))(x)
        box = nn.Conv(a * 7, (1, 1), dtype=self.dtype)(x)
        direction = nn.Conv(a * 2, (1, 1), dtype=self.dtype)(x)
        b, h, w, _ = x.shape
        # Heads return float32: decode / losses / NMS stay full precision.
        return {
            "cls": cls.reshape(b, h * w * a, self.num_classes).astype(
                jnp.float32),
            "box": box.reshape(b, h * w * a, 7).astype(jnp.float32),
            "dir": direction.reshape(b, h * w * a, 2).astype(jnp.float32),
        }


class PointPillars(nn.Module):
    """Full network: PFN -> scatter -> backbone -> head.

    Consumes the voxelizer's fixed-budget output; returns per-anchor
    predictions (the pipeline owns decode + NMS).
    """

    num_classes: int
    grid_size: Tuple[int, int, int]          # (nx, ny, nz)
    voxel_size: Tuple[float, float]
    pc_range_min: Tuple[float, float]
    num_anchors_per_cell: int
    pfn_filters: int = 64
    backbone_layers: Sequence[int] = (3, 5, 5)
    backbone_filters: Sequence[int] = (64, 128, 256)
    backbone_strides: Sequence[int] = (2, 2, 2)
    backbone_up_strides: Sequence[int] = (1, 2, 4)
    backbone_up_filters: Sequence[int] = (128, 128, 128)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels, coords, num_points, num_voxels,
                 train: bool = False):
        """Batched: voxels (B,P,K,4), coords (B,P,3), num_points (B,P),
        num_voxels (B,)."""
        nx, ny, _ = self.grid_size
        feats = PillarFeatureNet(
            self.pfn_filters, self.voxel_size, self.pc_range_min,
            dtype=self.dtype)(voxels, coords, num_points, train)  # (B,P,C)

        canvas = jax.vmap(
            lambda f, c, n: pillar_scatter(f, c, n, ny=ny, nx=nx)
        )(feats, coords, num_voxels)                             # (B,C,H,W)
        canvas = canvas.transpose(0, 2, 3, 1)                    # NHWC

        bev = BEVBackbone(
            layer_nums=tuple(self.backbone_layers),
            strides=tuple(self.backbone_strides),
            filters=tuple(self.backbone_filters),
            up_strides=tuple(self.backbone_up_strides),
            up_filters=tuple(self.backbone_up_filters),
            dtype=self.dtype)(canvas, train)
        return AnchorHead(self.num_classes, self.num_anchors_per_cell,
                          dtype=self.dtype)(bev)


class PointPillarsFused(nn.Module):
    """PointPillars over the fused pillar encoder: raw padded points in,
    per-anchor predictions out — no voxel buffer, no sort (see
    models/pillar_encoder.py for the reformulation)."""

    num_classes: int
    grid_size: Tuple[int, int, int]          # (nx, ny, nz)
    voxel_size: Tuple[float, float]
    pc_range: Tuple[float, ...]
    num_anchors_per_cell: int
    pfn_filters: int = 64
    backbone_layers: Sequence[int] = (3, 5, 5)
    backbone_filters: Sequence[int] = (64, 128, 256)
    backbone_strides: Sequence[int] = (2, 2, 2)
    backbone_up_strides: Sequence[int] = (1, 2, 4)
    backbone_up_filters: Sequence[int] = (128, 128, 128)
    dtype: jnp.dtype = jnp.float32
    fast_encoder: bool = True      # Pallas paint path at inference

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        from lisec_tpu.models.pillar_encoder import FusedPillarEncoder
        canvas = FusedPillarEncoder(
            num_filters=self.pfn_filters,
            pc_range=self.pc_range,
            voxel_size=self.voxel_size,
            grid=(self.grid_size[0], self.grid_size[1]),
            dtype=self.dtype,
            fast_inference=self.fast_encoder)(points, point_mask, train)
        bev = BEVBackbone(
            layer_nums=tuple(self.backbone_layers),
            strides=tuple(self.backbone_strides),
            filters=tuple(self.backbone_filters),
            up_strides=tuple(self.backbone_up_strides),
            up_filters=tuple(self.backbone_up_filters),
            dtype=self.dtype)(canvas, train)
        return AnchorHead(self.num_classes, self.num_anchors_per_cell,
                          dtype=self.dtype)(bev)

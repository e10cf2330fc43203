"""M4 — SECOND-style sparse-voxel detector (SURVEY.md §2.2 M4;
config 4, BASELINE.json:10).

Canonical architecture [arch]: small voxels (~0.05 x 0.05 x 0.1, <= a
few pts/voxel), mean-VFE, a sparse 3D middle encoder (submanifold +
strided sparse convs, 8x spatial downsample), flatten-z to BEV, then
the same RPN/anchor-head family as PointPillars. SECOND introduced the
sin-difference angle loss + direction classifier (lives in R2/R3).

TPU-native encoding: every sparse conv is the O7/O8 pair — a padded
dense rulebook built with vectorized binary searches over sorted cell
ids, then gather-GEMM-accumulate on the MXU (see ops/sparse_conv.py)
— round 2 swaps this for the scatter-form: batched tag-merge
rulebooks + per-offset MXU GEMMs routed through the Pallas paint
kernel as monotone spreads, all levels padded to one static size so
the stack shares a single Pallas kernel compile. Voxel-list budgets
per level are static config, so the whole encoder jits with fixed
shapes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lisec_tpu.models.common import ConvBNRelu
from lisec_tpu.models.pointpillars import AnchorHead, BEVBackbone
from lisec_tpu.ops.sparse_conv import (
    SparseConvSpec, build_output_coords, build_scatter_rulebook)


def mean_vfe(voxels: jax.Array, num_points: jax.Array) -> jax.Array:
    """Mean-VFE: (..., P, K, C) + counts (..., P) -> (..., P, C)."""
    k = voxels.shape[-2]
    mask = (jnp.arange(k) < num_points[..., None])[..., None]
    s = jnp.sum(voxels * mask.astype(voxels.dtype), axis=-2)
    return s / jnp.maximum(num_points[..., None], 1).astype(voxels.dtype)


class SparseConv3D(nn.Module):
    """One sparse conv (weights (K, Cin, Cout)) + BN + ReLU over a
    batched padded voxel list, evaluated scatter-form: per-offset MXU
    GEMM then a monotone spread through the Pallas paint kernel
    (ops.sparse_conv3d_spread) — no data-dependent gathers."""

    out_channels: int
    num_offsets: int
    dtype: jnp.dtype = jnp.float32
    pad_to: int = 0      # unify kernel shapes across the conv stack
    pad_c: int = 0       # unify stream channel width across the stack

    @nn.compact
    def __call__(self, feats, out_of, valid, train: bool = False):
        """feats (B, Vin, Cin), out_of (B, K, Vin) scatter rulebook,
        valid (B, Vout)."""
        from lisec_tpu.ops.sparse_conv import sparse_conv3d_spread

        cin = feats.shape[-1]
        w = self.param(
            "kernel", nn.initializers.variance_scaling(
                2.0, "fan_in", "truncated_normal"),
            (self.num_offsets, cin, self.out_channels), jnp.float32)
        interpret = jax.devices()[0].platform != "tpu"
        y = sparse_conv3d_spread(
            feats.astype(self.dtype), out_of, w.astype(self.dtype),
            v_out=valid.shape[1], interpret=interpret,
            pad_to=self.pad_to, pad_c=self.pad_c)
        y = y.astype(self.dtype)                        # (B, Vout, Cout)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(y)
        y = nn.relu(y)
        return jnp.where(valid[..., None], y, 0.0)


class SparseMiddleEncoder(nn.Module):
    """Submanifold + strided sparse conv stack, 8x downsample, then
    flatten-z scatter to a dense BEV canvas.

    grid: (nz, ny, nx) of the input voxel grid. Per-level voxel budgets
    are static. Channels follow the canonical 16/32/64/64 progression.
    """

    grid: Tuple[int, int, int]
    channels: Sequence[int] = (16, 32, 64, 64)
    level_budgets: Sequence[int] = (16000, 16000, 12000, 8000)
    subm_per_level: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, coords, num_voxels, train: bool = False):
        """feats (B, V, C), coords (B, V, 3) [z,y,x] sorted by cell id,
        num_voxels (B,) -> dense BEV (B, ny/8, nx/8, nz/8 * C_last)."""
        b, v, _ = feats.shape
        grid = tuple(self.grid)
        valid = jnp.arange(v)[None, :] < num_voxels[:, None]

        def subm_spec(g):
            return SparseConvSpec((3, 3, 3), (1, 1, 1), (1, 1, 1), g)

        def down_spec(g):
            return SparseConvSpec((3, 3, 3), (2, 2, 2), (1, 1, 1), g)

        x = feats
        cur_coords, cur_num, cur_valid = coords, num_voxels, valid
        # One static size for every conv in the stack -> one shared
        # Pallas kernel compile (see sparse_conv3d_spread pad_to).
        pad_v = max([v] + [int(bgt) for bgt in self.level_budgets])
        pad_v = -(-pad_v // 2048) * 2048
        pad_c = max(self.channels)

        for level, ch in enumerate(self.channels):
            # Submanifold convs at this resolution (out set = in set).
            spec = subm_spec(grid)
            srb = build_scatter_rulebook(
                cur_coords, cur_num, cur_coords, cur_num, spec)
            for _ in range(self.subm_per_level):
                x = SparseConv3D(ch, spec.num_offsets, self.dtype,
                                 pad_to=pad_v, pad_c=pad_c)(
                    x, srb, cur_valid, train)

            if level < len(self.channels) - 1:
                # Strided downsample to the next level's active set.
                dspec = down_spec(grid)
                budget = int(self.level_budgets[level + 1])
                out_coords, out_num = jax.vmap(
                    lambda c, n: build_output_coords(
                        c, n, dspec, max_out=budget))(cur_coords, cur_num)
                dsrb = build_scatter_rulebook(
                    cur_coords, cur_num, out_coords, out_num, dspec)
                out_valid = (jnp.arange(budget)[None, :]
                             < out_num[:, None])
                x = SparseConv3D(
                    self.channels[level + 1], dspec.num_offsets,
                    self.dtype, pad_to=pad_v, pad_c=pad_c)(
                    x, dsrb, out_valid, train)
                cur_coords, cur_num, cur_valid = (
                    out_coords, out_num, out_valid)
                grid = dspec.grid_out

        # Flatten z into channels on a dense BEV canvas:
        # (B, V, C) + coords -> (B, ny', nx', nz' * C).
        nz, ny, nx = grid
        c_last = x.shape[-1]
        lin = (cur_coords[..., 0] * ny + cur_coords[..., 1]) * nx \
            + cur_coords[..., 2]
        lin = jnp.where(cur_valid, lin, nz * ny * nx)

        def scatter_one(xi, li):
            canvas = jnp.zeros((nz * ny * nx + 1, c_last), xi.dtype)
            return canvas.at[li].set(xi, mode="drop")[:-1]

        dense = jax.vmap(scatter_one)(x, lin)        # (B, nz*ny*nx, C)
        dense = dense.reshape(b, nz, ny, nx, c_last)
        dense = dense.transpose(0, 2, 3, 1, 4).reshape(
            b, ny, nx, nz * c_last)
        return dense


class SECONDNet(nn.Module):
    """Mean-VFE -> sparse middle encoder -> BEV backbone -> anchor head."""

    num_classes: int
    grid_size: Tuple[int, int, int]            # (nx, ny, nz) voxel grid
    num_anchors_per_cell: int
    level_budgets: Sequence[int] = (16000, 16000, 12000, 8000)
    encoder_channels: Sequence[int] = (16, 32, 64, 64)
    bev_layers: Sequence[int] = (5, 5)
    bev_filters: Sequence[int] = (128, 256)
    bev_strides: Sequence[int] = (1, 2)
    bev_up_strides: Sequence[int] = (1, 2)
    bev_up_filters: Sequence[int] = (256, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels, coords, num_points, num_voxels,
                 train: bool = False):
        nx, ny, nz = self.grid_size
        feats = mean_vfe(voxels, num_points).astype(self.dtype)
        bev = SparseMiddleEncoder(
            grid=(nz, ny, nx),
            channels=tuple(self.encoder_channels),
            level_budgets=tuple(self.level_budgets),
            dtype=self.dtype)(feats, coords, num_voxels, train)
        bev = BEVBackbone(
            layer_nums=tuple(self.bev_layers),
            strides=tuple(self.bev_strides),
            filters=tuple(self.bev_filters),
            up_strides=tuple(self.bev_up_strides),
            up_filters=tuple(self.bev_up_filters),
            dtype=self.dtype)(bev, train)
        return AnchorHead(self.num_classes, self.num_anchors_per_cell,
                          dtype=self.dtype)(bev)

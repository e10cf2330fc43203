"""Fused pillar encoder — the TPU-native reformulation of
voxelize + PFN + pillar-scatter (SURVEY.md §2.3 O1/O6 + §2.2 M3).

The classic pipeline materializes a (P, K, C) voxel buffer (CUDA
hashing) and max-pools K points per pillar. On TPU that costs a sort
plus scatters. The PFN is per-point-then-per-pillar-max, so the buffer
is unnecessary; two equivalent formulations are kept:

**Training path (differentiable, pure XLA).** cell ids -> per-cell
count/xyz-sum scatter-add -> gather mean -> decorate -> Dense+BN+ReLU
-> scatter-max into the canvas. Simple, autodiff-friendly; its
data-dependent scatters run at XLA:TPU's ~2 GB/s scatter ceiling
(~30 ms/batch-8), which the backward-dominated train step tolerates.

**Inference path (Pallas, ~10x).** Measured on v5e: scatters/gathers
are ~2 GB/s no matter the hints; multi-operand sorts are ~free. So:
co-sort points by cell id, then algebraically split the PFN:

    Dense([pts4, xyz - mean_c, xy - center_c])
      = [pts4, xyz, xy] @ W  -  mean_c @ W[4:7]  -  center_c @ W[7:9]

The first term `u` is per-point (one f32 matmul — absolute coords do
NOT survive bf16); the rest is per-cell. Inference BatchNorm is an
affine y = s*h + t, and folding s into W keeps max/relu commuting:

    canvas_c = relu( max_c(u') - mean_c @ W'[4:7] - center_c @ W'[7:9] + t )

so the only data-dependent step is per-cell (max of u', sum of xyz/1),
computed by the Pallas slab-paint kernel (ops/pallas/pillar_paint.py)
at matmul/sort speed. Exact modulo float association.

The buffered path (ops.voxelize + PillarFeatureNet) remains for SECOND
(sparse conv needs explicit voxel lists) and as the public O1.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

_BN_MOMENTUM = 0.99
_BN_EPS = 1e-3


class FusedPillarEncoder(nn.Module):
    """points (B, N, 4) + mask (B, N) -> BEV canvas (B, ny, nx, C)."""

    num_filters: int = 64
    pc_range: Tuple[float, ...] = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
    voxel_size: Tuple[float, float] = (0.16, 0.16)
    grid: Tuple[int, int] = (432, 496)            # (nx, ny)
    dtype: jnp.dtype = jnp.float32
    fast_inference: bool = True                   # fused Pallas kernel
    fast_train: bool = True                       # paint/unpaint VJP path

    def _cells(self, points, point_mask):
        nx, ny = self.grid
        r = self.pc_range
        x, y, z = points[..., 0], points[..., 1], points[..., 2]
        ix = jnp.floor((x - r[0]) / self.voxel_size[0]).astype(jnp.int32)
        iy = jnp.floor((y - r[1]) / self.voxel_size[1]).astype(jnp.int32)
        valid = (
            (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
            & (z >= r[2]) & (z < r[5]) & point_mask.astype(bool))
        cell = jnp.where(valid, iy * nx + ix, nx * ny)     # (B, N)
        return cell, valid, ix, iy

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        c = self.num_filters
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (9, c), jnp.float32)
        bn_scale = self.param(
            "scale", nn.initializers.ones, (c,), jnp.float32)
        bn_bias = self.param(
            "bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if (self.is_initializing()
                or (train and not self.fast_train)
                or (not train and not self.fast_inference)):
            canvas = self._reference_path(
                points, point_mask, kernel, bn_scale, bn_bias,
                ra_mean, ra_var, train)
        elif train:
            canvas = self._train_pallas_path(
                points, point_mask, kernel, bn_scale, bn_bias,
                ra_mean, ra_var)
        else:
            canvas = self._pallas_path(
                points, point_mask, kernel, bn_scale, bn_bias,
                ra_mean.value, ra_var.value)
        nx, ny = self.grid
        return canvas.reshape(-1, ny, nx, c)

    # -- reference path (train + fallback): XLA scatters ----------------

    def _reference_path(self, points, point_mask, kernel, bn_scale,
                        bn_bias, ra_mean, ra_var, train):
        nx, ny = self.grid
        ncells = nx * ny
        r = self.pc_range
        cell, valid, ix, iy = self._cells(points, point_mask)
        x, y = points[..., 0], points[..., 1]

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

        h = (feats.astype(self.dtype)
             @ kernel.astype(self.dtype))                  # (B, N, C)
        h32 = h.astype(jnp.float32)
        if train:
            mu = jnp.mean(h32, axis=(0, 1))
            var = jnp.var(h32, axis=(0, 1))
            if not self.is_initializing():
                ra_mean.value = (_BN_MOMENTUM * ra_mean.value
                                 + (1.0 - _BN_MOMENTUM) * mu)
                ra_var.value = (_BN_MOMENTUM * ra_var.value
                                + (1.0 - _BN_MOMENTUM) * var)
        else:
            mu, var = ra_mean.value, ra_var.value
        s = bn_scale * jax.lax.rsqrt(var + _BN_EPS)
        t = bn_bias - s * mu
        h = nn.relu((h32 * s + t).astype(self.dtype))      # (B, N, C)

        # Scatter-max straight into the canvas. h >= 0 after ReLU, so a
        # zero-initialized canvas both collects the per-cell max and
        # leaves empty cells at the correct 0 (max commutes with relu).
        def canvas_one(cell_i, h_i):
            cv = jnp.zeros((ncells + 1, self.num_filters), h_i.dtype)
            cv = cv.at[cell_i].max(h_i, mode="drop")
            return cv[:ncells]
        h = jnp.where(valid[..., None], h, 0.0)
        return jax.vmap(canvas_one)(cell, h)               # (B, NC, C)

    # -- Pallas path (training): differentiable sort + paint/unpaint -----

    def _train_pallas_path(self, points, point_mask, kernel, bn_scale,
                           bn_bias, ra_mean, ra_var):
        """Training encoder without XLA scatters (~30 ms/batch-8 on the
        measured ~2 GB/s scatter ceiling): co-sort points by cell, get
        per-cell stats with the paint kernel, route per-point means back
        with the unpaint kernel (gather at MXU speed), then the only
        step touched by autodiff is feats @ W -> BN -> relu ->
        segment_max_sorted (custom VJP, ops/scatter.py). The decoration
        pipeline is parameter-free, so it sits under stop_gradient.
        Numerics match `_reference_path` modulo float association (same
        point multiset for the BN batch stats, exact routing)."""
        from lisec_tpu.ops.pallas.pillar_paint import segment_paint
        from lisec_tpu.ops.scatter import segment_max_sorted

        nx, ny = self.grid
        ncells = nx * ny
        r = self.pc_range
        b, n, _ = points.shape
        cell, _, _, _ = self._cells(points, point_mask)

        cell_s, xs, ys, zs, rs = jax.lax.sort(
            (cell, points[..., 0], points[..., 1], points[..., 2],
             points[..., 3]), dimension=1, num_keys=1)
        valid_s = (cell_s < ncells).astype(jnp.float32)

        interpret = jax.devices()[0].platform != "tpu"
        ones = valid_s[..., None]
        # 8-channel paint: only xyz sums + count are needed; the kernel's
        # DMA/scan/table cost scales with channel width (4.8 ms at 128
        # lanes for 4 useful channels — round-3 ledger).
        svals = jnp.concatenate(
            [jnp.stack([xs, ys, zs], -1) * ones,
             jnp.zeros((b, n, 4), jnp.float32), ones], axis=-1)
        stats = segment_paint(
            svals, cell_s, num_cells=ncells, num_max=0,
            count_channel=7, slab=2048, window=512,
            interpret=interpret)                           # (B, NC, 8)
        # Per-point means are a 4-LANE gather (xyz sums + count): slice
        # the table first and take_along_axis — ~2 MB of output even at
        # the ~2 GB/s gather ceiling, vs 10.8 ms/batch-4 for the
        # 128-lane unpaint kernel this replaced (profile_train round 3).
        stats4 = jnp.concatenate(
            [stats[..., :3], stats[..., 7:]], axis=-1)     # (B, NC, 4)
        per_pt = jnp.take_along_axis(
            stats4, jnp.minimum(cell_s, ncells - 1)[..., None], axis=1)
        per_pt = jnp.where((cell_s < ncells)[..., None], per_pt, 0.0)
        cnt_pt = jnp.maximum(per_pt[..., 3:], 1.0)
        mean_pt = per_pt[..., :3] / cnt_pt                 # (B, N, 3)

        cell_c = jnp.minimum(cell_s, ncells - 1)
        px = ((cell_c % nx).astype(jnp.float32) + 0.5) \
            * self.voxel_size[0] + r[0]
        py = ((cell_c // nx).astype(jnp.float32) + 0.5) \
            * self.voxel_size[1] + r[1]
        xyz_s = jnp.stack([xs, ys, zs], -1)
        feats = jnp.concatenate(
            [jnp.stack([xs, ys, zs, rs], -1),
             xyz_s - mean_pt,
             jnp.stack([xs - px, ys - py], -1)], axis=-1) * ones
        feats = jax.lax.stop_gradient(feats)               # (B, N, 9)

        h = (feats.astype(self.dtype)
             @ kernel.astype(self.dtype))
        h32 = h.astype(jnp.float32)
        mu = jnp.mean(h32, axis=(0, 1))
        var = jnp.var(h32, axis=(0, 1))
        if not self.is_initializing():
            ra_mean.value = (_BN_MOMENTUM * ra_mean.value
                             + (1.0 - _BN_MOMENTUM) * mu)
            ra_var.value = (_BN_MOMENTUM * ra_var.value
                            + (1.0 - _BN_MOMENTUM) * var)
        s = bn_scale * jax.lax.rsqrt(var + _BN_EPS)
        t = bn_bias - s * mu
        hr = nn.relu((h32 * s + t).astype(self.dtype))     # (B, N, C)

        canvas, count = segment_max_sorted(
            hr, cell_s, ncells, interpret)
        canvas = jnp.where(count[..., None] > 0.0, canvas, 0.0)
        return canvas.astype(self.dtype)

    # -- Pallas path (inference): one fully-fused kernel -----------------

    def _pallas_path(self, points, point_mask, kernel, bn_scale,
                     bn_bias, ra_mean, ra_var):
        from lisec_tpu.ops.pallas.encoder_kernel import pillar_canvas_fused

        # Fold inference BN into the PFN weights: y = s*h + t; the
        # kernel does sort -> scan -> route -> epilogue in one pass and
        # writes the canvas directly in the compute dtype (see
        # ops/pallas/encoder_kernel.py for the design).
        s = bn_scale * jax.lax.rsqrt(ra_var + _BN_EPS)
        t = bn_bias - s * ra_mean
        w = kernel * s[None, :]                            # (9, C)
        interpret = jax.devices()[0].platform != "tpu"
        return pillar_canvas_fused(
            points.astype(jnp.float32), point_mask, w, t,
            grid=self.grid, voxel_size=self.voxel_size,
            pc_range=self.pc_range, out_dtype=self.dtype,
            interpret=interpret)

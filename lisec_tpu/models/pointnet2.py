"""M2 — PointNet++ (SURVEY.md §2.2 M2; config 2, BASELINE.json:8).

Canonical architecture [arch]: Set-Abstraction modules (FPS -> ball
query -> grouping -> shared MLP -> max), Feature-Propagation modules
(3-NN inverse-distance interpolation + skip concat + MLP), per-point
head with the category one-hot. Built on the O2-O5 device ops — the
whole forward is one jitted program with static (budgeted) shapes.
SSG single-scale grouping; MSG = several radii concatenated.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lisec_tpu.models.common import SharedMLP, masked_max
from lisec_tpu.ops.ball_query import ball_query
from lisec_tpu.ops.fps import farthest_point_sampling
from lisec_tpu.ops.grouping import gather_points, group_and_decorate
from lisec_tpu.ops.three_nn import three_interpolate, three_nn


class SetAbstraction(nn.Module):
    """FPS -> ball query -> group+decorate -> shared MLP -> max-pool.

    Supports multi-scale grouping: one (radius, K, mlp) per scale,
    outputs concatenated (MSG when len > 1, SSG when 1).
    """

    num_samples: int
    radii: Sequence[float]
    num_neighbors: Sequence[int]
    mlps: Sequence[Sequence[int]]

    @nn.compact
    def __call__(self, xyz, features, mask, train: bool = False):
        """xyz (B,N,3), features (B,N,C) or None, mask (B,N) ->
        (new_xyz (B,M,3), new_features (B,M,C'), new_mask (B,M))."""
        idx = farthest_point_sampling(xyz, mask, self.num_samples)
        new_xyz = gather_points(xyz, idx)
        new_mask = jnp.take_along_axis(mask, idx, axis=-1)

        outs = []
        for radius, k, mlp in zip(self.radii, self.num_neighbors,
                                  self.mlps):
            nbr = ball_query(new_xyz, xyz, mask, radius=radius,
                             num_neighbors=k)            # (B,M,K)
            grouped = group_and_decorate(xyz, features, new_xyz, nbr)
            h = SharedMLP(mlp)(grouped, train)           # (B,M,K,C')
            # Ball-query repeat-fill means every slot holds a real
            # in-radius point, so a plain max is correct.
            outs.append(jnp.max(h, axis=-2))
        return new_xyz, jnp.concatenate(outs, axis=-1), new_mask


class GlobalSetAbstraction(nn.Module):
    """group_all variant: one global feature per cloud."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz, features, mask, train: bool = False):
        x = xyz if features is None else jnp.concatenate(
            [xyz, features], axis=-1)
        h = SharedMLP(self.mlp)(x, train)                # (B,N,C')
        return masked_max(h, mask, axis=-2)              # (B,C')


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance upsampling + skip concat + shared MLP."""

    mlp: Sequence[int]

    @nn.compact
    def __call__(self, xyz_target, xyz_source, feats_target, feats_source,
                 source_mask, train: bool = False):
        dist2, idx = three_nn(xyz_target, xyz_source, source_mask)
        interp = three_interpolate(feats_source, idx, dist2)
        if feats_target is not None:
            interp = jnp.concatenate([feats_target, interp], axis=-1)
        return SharedMLP(self.mlp)(interp, train)


class PointNet2PartSeg(nn.Module):
    """Part segmentation network (ShapeNetPart): SSG by default, MSG
    (multi-scale grouping — several radii per level, features
    concatenated) with ``msg=True`` [arch, PointNet++ paper]."""

    num_parts: int = 50
    num_categories: int = 16
    width: int = 1
    msg: bool = False

    @nn.compact
    def __call__(self, points, point_mask, category_onehot,
                 train: bool = False):
        """points (B,N,3+C), point_mask (B,N), category_onehot (B,16)
        -> per-point logits (B,N,num_parts)."""
        w = self.width
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        if self.msg:
            sa1 = SetAbstraction(
                512, (0.1, 0.2, 0.4), (16, 32, 64),
                ((32 * w, 32 * w, 64 * w),
                 (64 * w, 64 * w, 128 * w),
                 (64 * w, 96 * w, 128 * w)))
            sa2 = SetAbstraction(
                128, (0.4, 0.8), (64, 128),
                ((128 * w, 128 * w, 256 * w),
                 (128 * w, 196 * w, 256 * w)))
        else:
            sa1 = SetAbstraction(
                512, (0.2,), (32,), ((64 * w, 64 * w, 128 * w),))
            sa2 = SetAbstraction(
                128, (0.4,), (64,), ((128 * w, 128 * w, 256 * w),))
        xyz1, f1, m1 = sa1(xyz, feats, point_mask, train)
        xyz2, f2, m2 = sa2(xyz1, f1, m1, train)
        g = GlobalSetAbstraction((256 * w, 512 * w, 1024 * w))(
            xyz2, f2, m2, train)                          # (B,1024)

        # FP3: broadcast the global feature back to the 128 centers.
        gb = jnp.broadcast_to(
            g[:, None, :], (*xyz2.shape[:-1], g.shape[-1]))
        f2u = SharedMLP((256 * w, 256 * w))(
            jnp.concatenate([f2, gb], axis=-1), train)
        f1u = FeaturePropagation((256 * w, 128 * w))(
            xyz1, xyz2, f1, f2u, m2, train)

        # FP1 skip: raw points + category one-hot per point.
        cat = jnp.broadcast_to(
            category_onehot[:, None, :],
            (*xyz.shape[:-1], category_onehot.shape[-1]))
        skip = jnp.concatenate(
            [cat, xyz] + ([feats] if feats is not None else []), axis=-1)
        f0 = FeaturePropagation((128 * w, 128 * w, 128 * w))(
            xyz, xyz1, skip, f1u, m1, train)

        h = nn.Dense(128 * w)(f0)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.Dropout(0.4, deterministic=not train)(h)
        return nn.Dense(self.num_parts)(h)


class PointNet2Cls(nn.Module):
    """SSG classification network (ModelNet40-style)."""

    num_classes: int = 40
    width: int = 1

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        w = self.width
        xyz = points[..., :3]
        feats = points[..., 3:] if points.shape[-1] > 3 else None

        xyz1, f1, m1 = SetAbstraction(
            512, (0.2,), (32,), ((64 * w, 64 * w, 128 * w),))(
                xyz, feats, point_mask, train)
        xyz2, f2, m2 = SetAbstraction(
            128, (0.4,), (64,), ((128 * w, 128 * w, 256 * w),))(
                xyz1, f1, m1, train)
        g = GlobalSetAbstraction((256 * w, 512 * w, 1024 * w))(
            xyz2, f2, m2, train)

        h = nn.Dense(512 * w)(g)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.Dropout(0.4, deterministic=not train)(h)
        h = nn.Dense(256 * w)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = nn.relu(h)
        h = nn.Dropout(0.4, deterministic=not train)(h)
        return {"logits": nn.Dense(self.num_classes)(h),
                "feature_transform": None}

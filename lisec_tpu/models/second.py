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
    SparseConvSpec, build_footprint_coords, build_output_coords,
    build_scatter_rulebook)


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


class MaskedBatchNorm(nn.Module):
    """BatchNorm whose batch statistics are computed over ACTIVE
    positions only — the dense-grid equivalent of normalizing over a
    sparse voxel list. ``mask`` broadcasts against ``x[..., :1]``."""

    momentum: float = 0.99
    eps: float = 1e-3

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,),
                          jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if train:
            m = jnp.broadcast_to(
                mask.astype(jnp.float32), x.shape[:-1] + (1,))
            cnt = jnp.maximum(jnp.sum(m), 1.0)
            x32 = x.astype(jnp.float32) * m
            red = tuple(range(x.ndim - 1))
            mu = jnp.sum(x32, axis=red) / cnt
            var = jnp.maximum(
                jnp.sum(x32 * x32, axis=red) / cnt - mu * mu, 0.0)
            if not self.is_initializing():
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1.0 - self.momentum) * mu)
                ra_var.value = (self.momentum * ra_var.value
                                + (1.0 - self.momentum) * var)
        else:
            mu, var = ra_mean.value, ra_var.value
        s = scale * jax.lax.rsqrt(var + self.eps)
        t = bias - s * mu
        return (x.astype(jnp.float32) * s + t).astype(x.dtype)


class SparseMiddleEncoder(nn.Module):
    """Submanifold + strided sparse conv stack, 8x downsample, then
    flatten-z to a dense BEV canvas.

    grid: (nz, ny, nx) of the input voxel grid. Per-level voxel budgets
    are static. Channels follow the canonical 16/32/64/64 progression.

    ``dense_from_level`` switches levels >= it to a DENSE tail: the
    strided conv INTO level d still runs sparse (its budget should
    cover the true active count — see below), its output list is
    scattered onto the level-d dense grid together with an active-set
    indicator, and every later conv runs as a dense MXU conv with an
    active-set mask (exact submanifold semantics: conv -> masked BN ->
    relu -> zero outside the active set; for deeper strided convs the
    active set propagates by 3^3-window max-pool dilation, which is
    precisely the touched set). Measured rationale (round 4,
    benchmarks/profile_second_budgets.py): the stride-2 3^3 downsample
    DILATES a sparse active set — on KITTI-geometry fixtures 6.4k
    input voxels become 19.5k/24.9k/17.8k true actives at levels
    1/2/3, so (a) the old per-level budgets silently truncated 18-68%
    of active cells (with a spatial bias toward low cell ids), and
    (b) by level 2-3 the grid is 7-40% occupied — sparse machinery
    costs more than the dense conv it avoids (the same arithmetic as
    docs/SPARSITY.md). Dense from level 2 keeps the genuinely sparse
    levels (0.03-0.6% occupancy) on the rulebook+spread path and hands
    the rest to the MXU with no truncation beyond the level-d budget
    (size it at the data's p95 — 26624 covers the KITTI-geometry
    fixtures with margin; the level-2 grid canvas is ~90 MB/frame so
    densifying earlier would not fit HBM at training batch sizes).

    Budget truncation is NOT spatially neutral: compaction keeps the
    lowest linearized cell ids, and cell id = z*ny*nx + ..., so an
    undersized budget drops the HIGHEST z-layers wholesale (measured:
    at the old L2 default 12000 vs ~24.9k true actives, kept z-layers
    2-4, dropped 4-8 — the entire top of every car, which is where the
    front/back height-asymmetry heading cue lives; the direction
    classifier's CE stayed pinned at ln 2 for 7k convergence steps
    until the budgets were raised). Defaults below are the fixture
    p95 rounded up to lane multiples.
    """

    grid: Tuple[int, int, int]
    channels: Sequence[int] = (16, 32, 64, 64)
    level_budgets: Sequence[int] = (16000, 20480, 26624, 18432)
    subm_per_level: int = 2
    dense_from_level: int = 2
    downsample: str = "dilate"         # "dilate" | "footprint"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats, coords, num_voxels, train: bool = False):
        """feats (B, V, C), coords (B, V, 3) [z,y,x] sorted by cell id,
        num_voxels (B,) -> dense BEV (B, ny/8, nx/8, nz/8 * C_last)."""
        b, v, _ = feats.shape
        grid = tuple(self.grid)
        valid = jnp.arange(v)[None, :] < num_voxels[:, None]
        n_levels = len(self.channels)
        dense_from = min(max(self.dense_from_level, 1), n_levels)

        def subm_spec(g):
            return SparseConvSpec((3, 3, 3), (1, 1, 1), (1, 1, 1), g)

        def down_spec(g):
            return SparseConvSpec((3, 3, 3), (2, 2, 2), (1, 1, 1), g)

        x = feats
        cur_coords, cur_num, cur_valid = coords, num_voxels, valid
        # One static size for the level-0..(d-1) sparse convs -> one
        # shared Pallas kernel compile (see sparse_conv3d_spread
        # pad_to); the strided conv into the first dense level gets its
        # own (bigger-budget, wider-channel) shape. With the dense tail
        # the shared channel pad drops to the sparse levels' max (32
        # instead of 64 on the canonical progression — the spread
        # streams' HBM traffic scales with it).
        pad_v = max([v] + [int(bgt)
                           for bgt in self.level_budgets[:dense_from]])
        pad_v = -(-pad_v // 2048) * 2048
        pad_c = max(self.channels[:dense_from])

        for level in range(dense_from):
            ch = self.channels[level]
            # Submanifold convs at this resolution (out set = in set).
            spec = subm_spec(grid)
            # (A half-merge subm builder deriving mirror offsets by
            # paint-inversion measured 18.0 vs 10.9 ms — the 8-lane
            # inversion paint costs more than the 13 saved merges; see
            # docs/ROUND4_NOTES.md and git history for the variant.)
            srb = build_scatter_rulebook(
                cur_coords, cur_num, cur_coords, cur_num, spec)
            for _ in range(self.subm_per_level):
                x = SparseConv3D(ch, spec.num_offsets, self.dtype,
                                 pad_to=pad_v, pad_c=pad_c)(
                    x, srb, cur_valid, train)

            if level < n_levels - 1:
                # Strided downsample to the next level's active set
                # (sparse even when the next level is dense — the
                # pre-downsample grid's dense canvas would not fit HBM).
                dspec = down_spec(grid)
                budget = int(self.level_budgets[level + 1])
                last_sparse = level + 1 == dense_from
                # "footprint" restricts the strided conv's output set
                # to cells whose 2x2x2 input footprint is occupied
                # (sparsity retention: |out| <= |in| instead of the
                # 3-4x 3^3 dilation) — see build_footprint_coords.
                build = (build_footprint_coords
                         if self.downsample == "footprint"
                         else build_output_coords)
                out_coords, out_num = jax.vmap(
                    lambda c, n: build(
                        c, n, dspec, max_out=budget))(cur_coords, cur_num)
                dsrb = build_scatter_rulebook(
                    cur_coords, cur_num, out_coords, out_num, dspec)
                out_valid = (jnp.arange(budget)[None, :]
                             < out_num[:, None])
                x = SparseConv3D(
                    self.channels[level + 1], dspec.num_offsets,
                    self.dtype,
                    pad_to=(0 if last_sparse else pad_v),
                    pad_c=(0 if last_sparse else pad_c))(
                    x, dsrb, out_valid, train)
                cur_coords, cur_num, cur_valid = (
                    out_coords, out_num, out_valid)
                grid = dspec.grid_out

        # Densify the (now current) level: route the sorted unique-cell
        # voxel list onto its dense grid with the slab-paint kernel
        # (differentiable; the XLA row-scatter this replaces measured
        # ~800 ns/row = 22 ms/batch-4 on the level-2 grid). The paint's
        # count channel doubles as the active-set indicator.
        from lisec_tpu.ops.scatter import segment_sum_dense

        nz, ny, nx = grid
        c_cur = x.shape[-1]
        lin = (cur_coords[..., 0] * ny + cur_coords[..., 1]) * nx \
            + cur_coords[..., 2]
        lin = jnp.where(cur_valid, lin, nz * ny * nx)
        interpret = jax.devices()[0].platform != "tpu"
        tab, cnt = segment_sum_dense(x, lin, nz * ny * nx, interpret)
        x = tab.reshape(b, nz, ny, nx, c_cur).astype(self.dtype)
        active = (cnt > 0).reshape(b, nz, ny, nx, 1).astype(self.dtype)

        def dilate_pool(a):
            # Touched set of a k3/s2/p1 strided conv == 3^3 max-pool.
            if self.downsample == "footprint":
                # Footprint mode: active iff the 2x2x2 input footprint
                # is occupied (pad high edges when the grid is odd —
                # the conv output size is ceil(g/2)).
                pads = tuple((0, (g + 1) // 2 * 2 - g)
                             for g in a.shape[1:4])
                return nn.max_pool(a, (2, 2, 2), strides=(2, 2, 2),
                                   padding=pads)
            return nn.max_pool(a, (3, 3, 3), strides=(2, 2, 2),
                               padding=((1, 1), (1, 1), (1, 1)))

        def dense_conv(h, ch, stride):
            return nn.Conv(
                ch, (3, 3, 3), strides=(stride,) * 3,
                padding=((1, 1), (1, 1), (1, 1)), use_bias=False,
                dtype=self.dtype,
                kernel_init=nn.initializers.variance_scaling(
                    2.0, "fan_in", "truncated_normal"))(h)

        for level in range(dense_from, n_levels):
            ch = self.channels[level]
            if level > dense_from:
                # Dense strided conv into this level; zero input cells
                # contribute nothing, so the result equals the sparse
                # regular conv on the UNTRUNCATED active set.
                x = dense_conv(x, ch, 2)
                active = dilate_pool(active)
                x = nn.relu(MaskedBatchNorm()(x, active, train))
                x = x * active.astype(x.dtype)
                nz, ny, nx = [(g + 2 - 3) // 2 + 1
                              for g in (nz, ny, nx)]
            for _ in range(self.subm_per_level):
                h = dense_conv(x, ch, 1)
                h = nn.relu(MaskedBatchNorm()(h, active, train))
                x = h * active.astype(h.dtype)    # submanifold: out=in set

        # Flatten z into channels: (B, nz', ny', nx', C) ->
        # (B, ny', nx', nz' * C).
        c_last = x.shape[-1]
        x = x.transpose(0, 2, 3, 1, 4).reshape(b, ny, nx, nz * c_last)
        return x


class SECONDNet(nn.Module):
    """Mean-VFE -> sparse middle encoder -> BEV backbone -> anchor head."""

    num_classes: int
    grid_size: Tuple[int, int, int]            # (nx, ny, nz) voxel grid
    num_anchors_per_cell: int
    level_budgets: Sequence[int] = (16000, 20480, 26624, 18432)
    encoder_channels: Sequence[int] = (16, 32, 64, 64)
    dense_from_level: int = 2
    bev_layers: Sequence[int] = (5, 5)
    bev_filters: Sequence[int] = (128, 256)
    bev_strides: Sequence[int] = (1, 2)
    bev_up_strides: Sequence[int] = (1, 2)
    bev_up_filters: Sequence[int] = (256, 256)
    downsample: str = "dilate"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, voxels, coords, num_points, num_voxels,
                 train: bool = False):
        nx, ny, nz = self.grid_size
        if voxels.ndim == 3:
            # (B, P, C): pre-fused mean-VFE features from
            # ops.voxelize.voxelize_mean_batch — the voxelize+mean
            # paint that never materializes the (P, K, C) table.
            feats = voxels.astype(self.dtype)
        else:
            feats = mean_vfe(voxels, num_points).astype(self.dtype)
        bev = SparseMiddleEncoder(
            grid=(nz, ny, nx),
            channels=tuple(self.encoder_channels),
            level_budgets=tuple(self.level_budgets),
            dense_from_level=self.dense_from_level,
            downsample=self.downsample,
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

"""O6 — pillar scatter(-max) (SURVEY.md §2.3 O6).

Reference form: CUDA scatter of pillar features onto a dense BEV canvas.
TPU-native design: one XLA scatter (``zeros.at[...].set``/``.max``) —
XLA lowers this to a single fused scatter with deterministic semantics;
invalid pillars are routed to a trash row that is sliced off. The max
variant supports scatter-max when the per-pillar reduction has not
already been fused into the PillarFeatureNet max-pool.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


from functools import partial


@partial(jax.jit, static_argnames=("ny", "nx"))
def pillar_scatter(
    pillar_features: jax.Array,
    coords: jax.Array,
    num_voxels: jax.Array,
    *,
    ny: int,
    nx: int,
) -> jax.Array:
    """Scatter (P, C) features to a (C, ny, nx) canvas by coords [z,y,x].

    Invalid pillars (rank >= num_voxels or coords < 0) write to a trash
    cell. Each valid pillar owns a unique cell (voxelize guarantees one
    cell per pillar), so plain ``set`` is race-free.
    """
    p = pillar_features.shape[0]
    valid = (jnp.arange(p) < num_voxels) & (coords[:, 1] >= 0)
    lin = coords[:, 1] * nx + coords[:, 2]                      # y * nx + x
    lin = jnp.where(valid, lin, ny * nx)
    canvas = jnp.zeros((ny * nx + 1, pillar_features.shape[1]),
                       pillar_features.dtype)
    canvas = canvas.at[lin].set(pillar_features, mode="drop")
    return canvas[:-1].reshape(ny, nx, -1).transpose(2, 0, 1)


@partial(jax.jit, static_argnames=("num_cells",))
def pillar_scatter_max(
    point_features: jax.Array,
    point_voxel: jax.Array,
    *,
    num_cells: int,
) -> jax.Array:
    """Scatter-max per-point features into per-cell slots.

    point_features: (N, C); point_voxel: (N,) cell index, -1 = dropped.
    Returns (num_cells, C) max-reduced features (zeros where empty).
    """
    idx = jnp.where(point_voxel >= 0, point_voxel, num_cells)
    neg_inf = jnp.array(-jnp.inf, point_features.dtype)
    out = jnp.full((num_cells + 1, point_features.shape[1]), neg_inf,
                   point_features.dtype)
    out = out.at[idx].max(point_features, mode="drop")
    return jnp.where(jnp.isfinite(out[:-1]), out[:-1], 0.0)


# -- differentiable sorted segment-max (Pallas paint fwd / unpaint bwd) --
#
# The train-path pillar encoder needs the per-cell max of sorted
# per-point features WITH a gradient. XLA's scatter-max runs at the
# ~2 GB/s scatter ceiling in both directions; here the forward is the
# slab-paint kernel and the backward routes (canvas, cotangent) back to
# the points with the slab-unpaint kernel, then masks by the argmax
# indicator h == canvas[cell] (exact: both kernels' one-hot routing is
# a selection; ties are measure-zero for float inputs and relu-clipped
# ties carry zero upstream gradient anyway).


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_max_sorted(h, cell_sorted, num_cells, interpret=False):
    """Per-cell max of ascending-cell-sorted features.

    h: (B, N, C<=64) per-point features (any float dtype), sorted by
    ``cell_sorted`` (B, N) int32 ascending; invalid >= num_cells.
    Returns (canvas (B, num_cells, C) f32 with -3e38 where empty,
    count (B, num_cells) f32 valid-point counts).
    """
    return _segmax_impl(h, cell_sorted, num_cells, interpret)


def _segmax_impl(h, cell_sorted, num_cells, interpret):
    from lisec_tpu.ops.pallas.pillar_paint import segment_paint

    b, n, c = h.shape
    assert 2 * c <= 128, "segment_max_sorted supports C <= 64"
    # Narrowest sublane-multiple table that fits C max channels + the
    # count channel (C=64 -> 72 lanes instead of 128: the paint DMA /
    # scan / table-write cost scales with width).
    width = -(-(c + 1) // 8) * 8
    vals = jnp.concatenate([
        h.astype(jnp.float32),
        jnp.zeros((b, n, width - 1 - c), jnp.float32),
        jnp.ones((b, n, 1), jnp.float32)], axis=-1)
    tab = segment_paint(
        vals, cell_sorted, num_cells=num_cells, num_max=c,
        count_channel=width - 1, slab=2048, window=512,
        interpret=interpret, exact=True)
    return tab[..., :c], tab[..., width - 1]


def _segmax_fwd(h, cell_sorted, num_cells, interpret):
    canvas, count = _segmax_impl(h, cell_sorted, num_cells, interpret)
    return (canvas, count), (h, cell_sorted, canvas)


def _segmax_bwd(num_cells, interpret, res, g):
    from lisec_tpu.ops.pallas.unpaint import segment_unpaint

    h, cell_sorted, canvas = res
    g_canvas, _ = g                      # count carries no h-gradient
    b, _, c = h.shape
    width = -(-(2 * c) // 8) * 8
    tab = jnp.concatenate([
        canvas, g_canvas.astype(jnp.float32),
        jnp.zeros((b, canvas.shape[1], width - 2 * c), jnp.float32)],
        axis=-1)
    # Two routing passes, not three (round-5; ~1/3 of the 10.7 ms/b4
    # unpaint). Slicing lanes saves nothing (the one-hot matmul's
    # output tile pads to 128 lanes), but the EXACTNESS requirement is
    # narrower than round 3 assumed: the argmax indicator only needs
    # equality, and a 2-pass hi+mid route is an exact SELECTION of the
    # top-17-mantissa-bit prefix — so compare it against h's own
    # 2-pass reconstruction instead of raw f32. Distinct values that
    # collide in 17 bits both get g (the measure-zero tie caveat the
    # 3-pass version already carried). The cotangent lanes ride the
    # same 2 passes: |error| < 2^-17 relative, far under any training
    # or check_grads tolerance.
    per_pt = segment_unpaint(tab, cell_sorted, num_rows=num_cells,
                             interpret=interpret, exact=False,
                             slab=2048)
    mx2 = per_pt[..., :c]                 # hi+mid of the segment max
    gp = per_pt[..., c:2 * c]
    h32 = h.astype(jnp.float32)
    h_hi = h32.astype(jnp.bfloat16).astype(jnp.float32)
    h2 = h_hi + (h32 - h_hi).astype(jnp.bfloat16).astype(jnp.float32)
    dh = jnp.where(h2 == mx2, gp, 0.0)
    return dh.astype(h.dtype), None


segment_max_sorted.defvjp(_segmax_fwd, _segmax_bwd)


# -- differentiable sorted densify (Pallas paint fwd / unpaint bwd) ------
#
# SECOND's sparse->dense boundary scatters a sorted UNIQUE-cell voxel
# list onto its dense grid. The XLA row-scatter measured ~800 ns/row on
# the 352k-cell level-2 grid (~22 ms/batch-4,
# benchmarks/profile_dense_tail_ops.py); the slab-paint kernel writes
# the same table at HBM speed because sorted unique targets are its
# native case. Backward is the exact row-gather: route the cotangent
# table back to the voxel rows with the unpaint kernel.


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_sum_dense(h, cell_sorted, num_cells, interpret=False):
    """Dense per-cell sum table of ascending-cell-sorted features.

    h: (B, N, C) per-row features, sorted by ``cell_sorted`` (B, N)
    int32 ascending; invalid >= num_cells. With unique cells (the
    voxel-list case) the sum is an exact placement. Returns
    (table (B, num_cells, C) f32 zeros where empty,
    count (B, num_cells) f32 per-cell row counts).
    """
    return _segsum_impl(h, cell_sorted, num_cells, interpret)


def _segsum_impl(h, cell_sorted, num_cells, interpret):
    from lisec_tpu.ops.pallas.pillar_paint import segment_paint

    b, n, c = h.shape
    width = -(-(c + 1) // 8) * 8
    vals = jnp.concatenate([
        h.astype(jnp.float32),
        jnp.zeros((b, n, width - 1 - c), jnp.float32),
        jnp.ones((b, n, 1), jnp.float32)], axis=-1)
    valid = (cell_sorted < num_cells)[..., None]
    vals = jnp.where(valid, vals, 0.0)
    tab = segment_paint(
        vals, cell_sorted, num_cells=num_cells, num_max=0,
        count_channel=width - 1, slab=2048, window=512,
        interpret=interpret, exact=True)
    return tab[..., :c], tab[..., width - 1]


def _segsum_fwd(h, cell_sorted, num_cells, interpret):
    out = _segsum_impl(h, cell_sorted, num_cells, interpret)
    # (residuals must be JAX values — carry h's dtype as an empty array)
    return out, (jnp.zeros((0,), h.dtype), cell_sorted)


def _segsum_bwd(num_cells, interpret, res, g):
    from lisec_tpu.ops.pallas.unpaint import segment_unpaint

    dtype_probe, cell_sorted = res
    dtype = dtype_probe.dtype
    g_tab, _ = g                        # count carries no h-gradient
    b, _, c = g_tab.shape
    width = -(-c // 8) * 8
    tab = jnp.concatenate([
        g_tab.astype(jnp.float32),
        jnp.zeros((b, g_tab.shape[1], width - c), jnp.float32)],
        axis=-1) if width != c else g_tab.astype(jnp.float32)
    # Sum-gradient is a pure value gather — no equality test — so the
    # 2-pass hi+mid route (|error| < 2^-17 relative) replaces the
    # 3-pass exact one (round-5, same argument as _segmax_bwd).
    per_row = segment_unpaint(tab, cell_sorted, num_rows=num_cells,
                              interpret=interpret, exact=False,
                              slab=2048)
    return per_row[..., :c].astype(dtype), None


segment_sum_dense.defvjp(_segsum_fwd, _segsum_bwd)

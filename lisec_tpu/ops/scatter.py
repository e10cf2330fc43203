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

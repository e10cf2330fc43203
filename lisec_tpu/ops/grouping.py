"""O4 — grouping / gather (SURVEY.md §2.3 O4).

Reference form: CUDA ``group_points`` + grad. TPU-native design: a
single ``take_along_axis`` gather (XLA fuses the subsequent relative-
coordinate decorate); the gradient is XLA's native scatter-add, so no
custom VJP is needed. Profiling hook: if copies show up hot, a fused
Pallas gather+decorate drops in behind the same signature.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gather_points(points: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather rows: points (..., N, C), indices (..., M) -> (..., M, C)."""
    return jnp.take_along_axis(points, indices[..., None], axis=-2)


def group_points(
    features: jax.Array,
    indices: jax.Array,
) -> jax.Array:
    """Gather features by neighbor index.

    features: (..., N, C); indices: (..., M, K) -> (..., M, K, C).
    """
    n = features.shape[-2]
    flat = indices.reshape(*indices.shape[:-2], -1)            # (..., M*K)
    g = jnp.take_along_axis(features, flat[..., None], axis=-2)
    return g.reshape(*indices.shape, features.shape[-1])


def group_and_decorate(
    xyz: jax.Array,
    features: jax.Array | None,
    centers_xyz: jax.Array,
    indices: jax.Array,
) -> jax.Array:
    """Gather neighborhood coords (+features) and subtract the center.

    xyz: (..., N, 3); features: (..., N, C) or None;
    centers_xyz: (..., M, 3); indices: (..., M, K).
    Returns (..., M, K, 3+C) with relative coordinates first.
    """
    grouped_xyz = group_points(xyz, indices) - centers_xyz[..., None, :]
    if features is None:
        return grouped_xyz
    grouped_feat = group_points(features, indices)
    return jnp.concatenate([grouped_xyz, grouped_feat], axis=-1)

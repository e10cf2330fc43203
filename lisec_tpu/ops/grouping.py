"""O4 — grouping / gather (SURVEY.md §2.3 O4).

Reference form: CUDA ``group_points`` + grad. TPU-native design: on
TPU, neighbor gathers route through the one-hot MXU gather kernel
(ops/pallas/gather_mxu.py) whenever the source table fits VMEM —
XLA's data-dependent gather runs at ~2 GB/s effective on this hardware
(benchmarks/profile_scatter.py) and PointNet++ grouping was gather-
bound. Elsewhere (CPU oracle runs, oversized tables) it stays a single
``take_along_axis`` whose gradient is XLA's native scatter-add.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _mxu_gather(features: jax.Array, flat_idx: jax.Array):
    """(..., N, C) x (..., M') -> (..., M', C) via the MXU kernel, or
    None if the table doesn't fit VMEM / not on TPU."""
    from lisec_tpu.ops.pallas.gather_mxu import fits_vmem, gather_rows

    n, c = features.shape[-2], features.shape[-1]
    if jax.devices()[0].platform != "tpu":
        return None
    if not fits_vmem(n, c, features.dtype):
        return None
    lead = features.shape[:-2]
    b = int(np.prod(lead)) if lead else 1
    g = gather_rows(features.reshape(b, n, c),
                    flat_idx.reshape(b, -1))
    return g.reshape(*lead, flat_idx.shape[-1], c)


def gather_points(points: jax.Array, indices: jax.Array) -> jax.Array:
    """Gather rows: points (..., N, C), indices (..., M) -> (..., M, C)."""
    g = _mxu_gather(points, indices)
    if g is not None:
        return g
    return jnp.take_along_axis(points, indices[..., None], axis=-2)


def group_points(
    features: jax.Array,
    indices: jax.Array,
) -> jax.Array:
    """Gather features by neighbor index.

    features: (..., N, C); indices: (..., M, K) -> (..., M, K, C).
    """
    flat = indices.reshape(*indices.shape[:-2], -1)            # (..., M*K)
    g = _mxu_gather(features, flat)
    if g is None:
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

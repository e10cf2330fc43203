"""O5 — 3-NN + three_interpolate (SURVEY.md §2.3 O5).

Reference form: CUDA kNN + weighted-sum forward/backward. TPU-native
design: brute-force distance matrix + ``top_k`` (k=3) + a gather-
weighted-sum that XLA differentiates natively (gather grad = scatter-
add). Used by PointNet++ Feature Propagation.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from lisec_tpu.ops.grouping import group_points

_EPS = 1e-8


@jax.jit
def three_nn(
    query_xyz: jax.Array,
    source_xyz: jax.Array,
    source_mask: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """For each query point, its 3 nearest valid source points.

    query_xyz: (..., N, 3); source_xyz: (..., S, 3); source_mask: (..., S).
    Returns (dist2 (..., N, 3), idx (..., N, 3) int32).
    """
    d2 = jnp.sum(
        (query_xyz[..., :, None, :] - source_xyz[..., None, :, :]) ** 2,
        axis=-1)                                               # (..., N, S)
    big = jnp.array(jnp.finfo(d2.dtype).max, d2.dtype)
    d2 = jnp.where(source_mask.astype(bool)[..., None, :], d2, big)
    neg_d2, idx = jax.lax.top_k(-d2, 3)
    return -neg_d2, idx.astype(jnp.int32)


@jax.jit
def three_interpolate(
    features: jax.Array,
    idx: jax.Array,
    dist2: jax.Array,
) -> jax.Array:
    """Inverse-distance weighted interpolation of source features.

    features: (..., S, C); idx/dist2: (..., N, 3) -> (..., N, C).
    """
    w = 1.0 / (dist2 + _EPS)
    w = w / jnp.sum(w, axis=-1, keepdims=True)                 # (..., N, 3)
    gathered = group_points(features, idx)                      # (..., N, 3, C)
    return jnp.sum(gathered * w[..., None], axis=-2)

"""O3 — ball query (SURVEY.md §2.3 O3).

Reference form: CUDA radius search returning <= nsample indices per
center with repeat-fill. TPU-native design: tiled brute-force O(M*N)
distance matrix (VPU) + ``top_k`` over an index-valued key, fixed K —
fully static shapes. Matches the canonical semantics: the first K
in-radius points *in index order*, repeat-filling with the first found
index when fewer than K fall inside the ball.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("num_neighbors", "force_approx"))
def ball_query(
    centers: jax.Array,
    points: jax.Array,
    point_mask: jax.Array,
    *,
    radius: float,
    num_neighbors: int,
    force_approx: bool | None = None,
) -> jax.Array:
    """Indices of up to K points within ``radius`` of each center.

    Args:
      centers: (..., M, 3); points: (..., N, 3); point_mask: (..., N).

    Returns:
      (..., M, K) int32 indices into N. Centers with zero in-radius
      points return index 0 (callers should mask by their own center
      validity; this mirrors the canonical repeat-fill convention).
    """
    if centers.ndim > 2:
        return jax.vmap(
            lambda c, p, m: ball_query(
                c, p, m, radius=radius, num_neighbors=num_neighbors,
                force_approx=force_approx)
        )(centers, points, point_mask)

    n = points.shape[0]
    # d2 through the |c|^2 - 2c.p + |p|^2 decomposition: the cross term
    # is one (M, 3) @ (3, N) MXU matmul, so no (M, N, 3) difference
    # tensor is materialized (round-3 profile: the broadcast form cost
    # 6 ms/batch-16 at 512x2048 — a third of the whole partseg net).
    cross = centers @ points.T                                # (M, N)
    d2 = (jnp.sum(centers * centers, -1)[:, None] - 2.0 * cross
          + jnp.sum(points * points, -1)[None, :])
    inside = (d2 < radius * radius) & point_mask.astype(bool)[None, :]

    idx = jnp.arange(n, dtype=jnp.int32)
    # Key: in-radius points keep their index; others get n (sorts last).
    key = jnp.where(inside, idx[None, :], n)
    # Smallest K keys = first K in-radius indices in index order. On
    # TPU approx_max_k rides the dedicated sort unit; ball-query
    # semantics tolerate its <2% recall loss (the canonical op returns
    # an ARBITRARY <=K in-radius subset anyway).
    # force_approx exists so CPU tests can exercise the approx branch
    # that ships on device (off-device approx_max_k is an exact
    # fallback, but the wiring/shape/fill semantics are the same code).
    use_approx = (jax.default_backend() == "tpu"
                  if force_approx is None else force_approx)
    if use_approx:
        neg_topk, _ = jax.lax.approx_max_k(
            -key.astype(jnp.float32), num_neighbors,
            recall_target=0.98)
        knn = (-neg_topk).astype(jnp.int32)
    else:
        neg_topk, _ = jax.lax.top_k(-key, num_neighbors)      # (M, K)
        knn = (-neg_topk).astype(jnp.int32)
    # Repeat-fill empty slots with the first found index (or 0 if none).
    first = jnp.where(knn[:, :1] < n, knn[:, :1], 0)
    return jnp.where(knn < n, knn, first)

"""O2 — farthest-point sampling (SURVEY.md §2.3 O2).

Reference form: CUDA kernel doing an iterative argmax over a running
min-distance table. TPU-native design: the same O(N*M) recurrence as a
``lax.fori_loop`` with a (N,) distance table resident on device — each
iteration is one fused VPU pass (distance update + argmax). Batched via
``vmap``. Masked (padded) points never get selected: their distance is
pinned to -inf.

Determinism: ties broken by lowest index (jnp.argmax semantics), seeded
by point 0 (the convention of the canonical implementation class).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from functools import partial


@partial(jax.jit, static_argnames=("num_samples", "use_pallas"))
def farthest_point_sampling(
    points: jax.Array,
    point_mask: jax.Array,
    num_samples: int,
    *,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Select ``num_samples`` indices maximizing spread.

    Args:
      points: (..., N, 3) float coordinates.
      point_mask: (..., N) validity mask.
      num_samples: M, static.
      use_pallas: force/forbid the Pallas kernel (None = auto: Pallas
        on TPU — the VMEM-resident distance table is ~2.3x faster than
        the XLA fori_loop at large N*M — XLA elsewhere). Both paths
        produce identical indices (lowest-index tie-breaking).

    Returns:
      (..., M) int32 indices into N. If fewer than M valid points exist,
      the remaining slots repeat already-chosen (valid) indices.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu", "gpu")
    if use_pallas:
        from lisec_tpu.ops.pallas.fps_kernel import fps_pallas
        return fps_pallas(points, point_mask, num_samples)
    if points.ndim > 2:
        return jax.vmap(
            lambda p, m: farthest_point_sampling(p, m, num_samples)
        )(points, point_mask)

    n = points.shape[0]
    mask = point_mask.astype(bool)
    # Start from the first valid point.
    first = jnp.argmax(mask)

    neg_inf = jnp.array(-jnp.inf, points.dtype)

    def body(i, state):
        dist, selected = state
        last = selected[i - 1]
        d = jnp.sum((points - points[last]) ** 2, axis=-1)
        dist = jnp.minimum(dist, jnp.where(mask, d, neg_inf))
        nxt = jnp.argmax(dist)
        selected = selected.at[i].set(nxt.astype(jnp.int32))
        return dist, selected

    dist0 = jnp.where(mask, jnp.inf, neg_inf).astype(points.dtype)
    selected0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first.astype(jnp.int32))
    # After processing the seed, its distance entry becomes 0, so argmax
    # naturally avoids re-picking until all valid points are exhausted.
    _, selected = jax.lax.fori_loop(1, num_samples, body, (dist0, selected0))
    return selected

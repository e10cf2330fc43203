"""§5.7 — large-scene point-dimension sharding (SURVEY.md §5.7, §2.4).

The domain analogue of sequence/context parallelism for this model
class: when one scene's cloud outgrows a chip (or its O(N*M) sampling
math outgrows a step budget), shard the POINT axis of the O2/O3
distance computations across the mesh and reduce with XLA collectives
over ICI. Deferred past the north star by the survey; built here so the
capability exists and is tested (vs single-device equality on the
8-virtual-device CPU mesh, tests/test_point_sharded.py).

Design: ``shard_map`` over a 1-D ``('points',)`` mesh axis.

* FPS: each shard keeps the running min-distance table for its slice
  of points. Per iteration the winner is the global argmax — computed
  as a lexicographic (distance, -global_index) ``lax.pmax`` so the
  lowest-index tie-break matches the single-device op exactly — and the
  winner's coordinates reach every shard with a one-hot ``psum``
  (winner-shard contributes, others add zero). O(N/D * M) work per
  shard + two scalar-ish collectives per iteration.

* Ball query: every shard answers with its local first-K in-radius
  indices (global numbering), an ``all_gather`` over the mesh axis
  concatenates the per-shard candidate lists in shard order ==
  ascending global index order, and a ``top_k`` of the smallest keys
  reproduces the canonical "first K in index order, repeat-filled"
  output. Collective payload is (M, D*K) indices, not the (M, N)
  distance matrix.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def fps_sharded(
    points: jax.Array,       # (N, 3) — N divisible by mesh axis size
    point_mask: jax.Array,   # (N,)
    num_samples: int,
    mesh: Mesh,
    axis: str = "points",
) -> jax.Array:
    """Point-axis-sharded farthest point sampling.

    Output (num_samples,) int32 global indices — identical to
    ``ops.farthest_point_sampling`` (lowest-index tie-breaking),
    replicated on every device.
    """
    n = points.shape[0]
    d = mesh.shape[axis]
    assert n % d == 0, "point count must divide the mesh axis"

    def local(pts, msk):
        # pts (N/d, 3), msk (N/d) — this shard's slice.
        shard = jax.lax.axis_index(axis)
        nl = pts.shape[0]
        gidx = shard * nl + jnp.arange(nl, dtype=jnp.int32)
        mask = msk.astype(bool)
        neg_inf = jnp.array(-jnp.inf, pts.dtype)

        def best(dist):
            # Global lexicographic argmax (dist, lowest global index).
            li = jnp.argmax(dist)
            pair = jnp.stack([dist[li],
                              -(gidx[li].astype(pts.dtype))])
            # pmax on the distance, then on -index among dist-winners.
            gmax = jax.lax.pmax(pair[0], axis)
            tied_neg_idx = jnp.where(pair[0] == gmax, pair[1], -jnp.inf)
            gni = jax.lax.pmax(tied_neg_idx, axis)
            widx = (-gni).astype(jnp.int32)
            # Winner's coords to everyone: one-hot psum.
            mine = (widx >= shard * nl) & (widx < (shard + 1) * nl)
            lrow = jnp.where(mine, widx - shard * nl, 0)
            coords = jnp.where(mine, pts[lrow], jnp.zeros((3,), pts.dtype))
            coords = jax.lax.psum(coords, axis)
            return widx, coords

        # Seed: first valid global index.
        d0 = jnp.where(mask, jnp.inf, neg_inf).astype(pts.dtype)
        seed_key = jnp.where(mask, -(gidx.astype(pts.dtype)),
                             -jnp.inf)
        skey = jax.lax.pmax(jnp.max(seed_key), axis)
        first = (-skey).astype(jnp.int32)
        mine0 = (first >= shard * nl) & (first < (shard + 1) * nl)
        lrow0 = jnp.where(mine0, first - shard * nl, 0)
        c0 = jax.lax.psum(
            jnp.where(mine0, pts[lrow0], jnp.zeros((3,), pts.dtype)),
            axis)

        def body(i, state):
            dist, selected, last_c = state
            dd = jnp.sum((pts - last_c) ** 2, axis=-1)
            dist = jnp.minimum(dist, jnp.where(mask, dd, neg_inf))
            widx, wc = best(dist)
            selected = selected.at[i].set(widx)
            return dist, selected, wc

        sel0 = jnp.zeros((num_samples,), jnp.int32).at[0].set(first)
        _, selected, _ = jax.lax.fori_loop(
            1, num_samples, body, (d0, sel0, c0))
        return selected

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(axis), P(axis)),
        out_specs=P(),
        check_vma=False)
    return fn(points, point_mask)


def ball_query_sharded(
    centers: jax.Array,      # (M, 3) replicated
    points: jax.Array,       # (N, 3) sharded on the point axis
    point_mask: jax.Array,   # (N,)
    *,
    radius: float,
    num_neighbors: int,
    mesh: Mesh,
    axis: str = "points",
) -> jax.Array:
    """Point-axis-sharded ball query; output == ``ops.ball_query``."""
    n = points.shape[0]
    d = mesh.shape[axis]
    assert n % d == 0, "point count must divide the mesh axis"
    k = num_neighbors

    def local(ctr, pts, msk):
        shard = jax.lax.axis_index(axis)
        nl = pts.shape[0]
        gidx = shard * nl + jnp.arange(nl, dtype=jnp.int32)
        d2 = jnp.sum((ctr[:, None, :] - pts[None, :, :]) ** 2, axis=-1)
        inside = (d2 < radius * radius) & msk.astype(bool)[None, :]
        key = jnp.where(inside, gidx[None, :], n)           # (M, nl)
        neg_topk, _ = jax.lax.top_k(-key, min(k, nl))       # local K
        cand = -neg_topk                                    # (M, <=K)
        # Shard order == ascending global index order, so gathering the
        # per-shard candidate lists and re-top_k-ing gives the global
        # first-K in index order.
        allc = jax.lax.all_gather(cand, axis, axis=1)       # (M, D, K)
        allc = allc.reshape(ctr.shape[0], -1)
        neg2, _ = jax.lax.top_k(-allc, k)
        knn = (-neg2).astype(jnp.int32)
        first = jnp.where(knn[:, :1] < n, knn[:, :1], 0)
        return jnp.where(knn < n, knn, first)

    fn = shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(axis), P(axis)),
        out_specs=P(),
        check_vma=False)
    return fn(centers, points, point_mask)

"""O10 — rotated BEV IoU (SURVEY.md §2.3 O10).

Reference form: C++/CUDA polygon clipping. TPU-native design: fully
vectorized Sutherland–Hodgman clipping of one yawed rectangle by the
four half-planes of another, over a **fixed 8-vertex buffer** (a convex
quad clipped by a convex quad has at most 8 vertices; each half-plane
clip adds at most one). No data-dependent shapes: vertex counts are
carried as scalars and compaction is a cumsum + scatter. Used by target
assignment (R3), rotated NMS (O11), and KITTI eval (O15).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lisec_tpu.ops.boxes import boxes_to_corners_bev

_MAX_V = 8
_EPS = 1e-8


def _clip_by_edge(poly, count, p1, p2):
    """Clip polygon (8,2) with `count` valid CCW vertices by the
    half-plane left of directed edge p1->p2. Returns (new_poly, new_count).
    """
    idx = jnp.arange(_MAX_V)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    v_cur = poly                                  # (8, 2)
    v_nxt = poly[nxt]                             # (8, 2)

    edge = p2 - p1
    def side(v):
        return edge[0] * (v[..., 1] - p1[1]) - edge[1] * (v[..., 0] - p1[0])

    s_cur = side(v_cur)
    s_nxt = side(v_nxt)
    inside_cur = s_cur >= -_EPS
    inside_nxt = s_nxt >= -_EPS

    active = idx < count
    emit_cur = active & inside_cur
    emit_int = active & (inside_cur != inside_nxt)

    # Intersection of segment (v_cur, v_nxt) with the edge line.
    denom = s_cur - s_nxt
    t = s_cur / jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
    v_int = v_cur + t[:, None] * (v_nxt - v_cur)

    # Each slot emits [current?, intersection?] in that order; compact
    # into the output buffer by exclusive prefix sums.
    n_emit = emit_cur.astype(jnp.int32) + emit_int.astype(jnp.int32)
    offs = jnp.cumsum(n_emit) - n_emit            # exclusive cumsum
    pos_cur = jnp.where(emit_cur, offs, _MAX_V)
    pos_int = jnp.where(emit_int, offs + emit_cur.astype(jnp.int32), _MAX_V)

    out = jnp.zeros((_MAX_V + 1, 2), poly.dtype)
    out = out.at[pos_cur].set(v_cur, mode="drop")
    out = out.at[pos_int].set(v_int, mode="drop")
    return out[:_MAX_V], jnp.sum(n_emit)


def _poly_area(poly, count):
    """Shoelace area of the first `count` CCW vertices of (8,2)."""
    idx = jnp.arange(_MAX_V)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    v, w = poly, poly[nxt]
    cross = v[:, 0] * w[:, 1] - v[:, 1] * w[:, 0]
    cross = jnp.where(idx < count, cross, 0.0)
    return 0.5 * jnp.abs(jnp.sum(cross))


def _intersection_area(corners_a, corners_b):
    """Area of intersection of two CCW quads (4,2) each."""
    poly = jnp.zeros((_MAX_V, 2), corners_a.dtype).at[:4].set(corners_a)
    count = jnp.array(4, jnp.int32)
    for k in range(4):
        p1 = corners_b[k]
        p2 = corners_b[(k + 1) % 4]
        poly, count = _clip_by_edge(poly, count, p1, p2)
    return jnp.where(count >= 3, _poly_area(poly, count), 0.0)


@jax.jit
def rotated_iou_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Elementwise rotated BEV IoU of 7-DoF boxes.

    boxes_a, boxes_b: broadcast-compatible (..., 7). Returns (...,).
    """
    boxes_a, boxes_b = jnp.broadcast_arrays(boxes_a, boxes_b)
    shape = boxes_a.shape[:-1]
    a = boxes_a.reshape(-1, 7)
    b = boxes_b.reshape(-1, 7)
    ca = boxes_to_corners_bev(a)                  # (P, 4, 2) CCW
    cb = boxes_to_corners_bev(b)
    inter = jax.vmap(_intersection_area)(ca, cb)
    area_a = a[:, 3] * a[:, 4]
    area_b = b[:, 3] * b[:, 4]
    union = area_a + area_b - inter
    iou = inter / jnp.maximum(union, _EPS)
    return iou.reshape(shape)


def rotated_iou_matrix(
    boxes_a: jax.Array,
    boxes_b: jax.Array,
    *,
    row_chunk: int = 0,
) -> jax.Array:
    """Pairwise rotated BEV IoU: (M, 7) x (N, 7) -> (M, N).

    ``row_chunk`` > 0 evaluates the matrix in row blocks via
    ``lax.map`` to bound peak memory on large M*N.
    """
    m = boxes_a.shape[0]

    def rows(a_block):
        return rotated_iou_bev(a_block[:, None, :], boxes_b[None, :, :])

    if row_chunk and m > row_chunk and m % row_chunk == 0:
        blocks = boxes_a.reshape(m // row_chunk, row_chunk, 7)
        return jax.lax.map(rows, blocks).reshape(m, -1)
    return rows(boxes_a)

"""O10 — rotated BEV IoU (SURVEY.md §2.3 O10).

Reference form: C++/CUDA polygon clipping. TPU-native design:
**scatter-free, transcendental-free** quad-quad intersection.
Sutherland-Hodgman clipping with vertex compaction needs
data-dependent scatters, which XLA:TPU serializes (measured ~1000x
slower than the arithmetic). Instead the intersection polygon's
vertices are *enumerated* directly:

  * corners of A inside B (4), corners of B inside A (4),
  * the 16 edge-pair intersection points,

masked by validity, ordered by a **pseudo-angle** (one division — no
arctan2) around the valid-point centroid with ONE batched 24-wide sort
(XLA sorts along the minor axis vectorized across pairs), and
integrated with the shoelace formula over the sorted ring. Everything
is comparisons, arithmetic, one sort — VPU-friendly, no scatter, no
gather, no transcendentals. (A Green's-theorem boundary-integral
variant was tried and rejected: its two independent clip passes make
inconsistent float decisions on near-parallel same-direction edges —
ubiquitous in NMS — and the resulting double-counted segment has an
origin-dependent, unbounded area error. Enumeration is robust: vertex
noise is O(eps), so area noise is too.) Used by target assignment
(R3), rotated NMS (O11), and KITTI eval (O15).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from lisec_tpu.ops.boxes import boxes_to_corners_bev

# Tolerance for the inside / intersection predicates. Pairs are
# recentered before the corner geometry is built (see rotated_iou_bev),
# so coordinates are O(box size ~ 5 m) and f32 cross products carry
# ~1e-6 rounding noise; 1e-5 absorbs it with margin while staying
# negligible against real box dimensions.
_EPS = 1e-5


def _cross(o, a, b):
    """2D cross of (a - o) x (b - o) over leading batch dims."""
    return ((a[..., 0] - o[..., 0]) * (b[..., 1] - o[..., 1])
            - (a[..., 1] - o[..., 1]) * (b[..., 0] - o[..., 0]))


def _corners_inside(pts, quad):
    """pts (..., 4, 2) inside CCW quad (..., 4, 2) -> (..., 4) bool."""
    v0 = quad[..., :, None, :]                       # (..., 4edge, 1, 2)
    v1 = jnp.roll(quad, -1, axis=-2)[..., :, None, :]
    p = pts[..., None, :, :]                          # (..., 1, 4pt, 2)
    cr = _cross(v0, v1, p)                            # (..., 4e, 4p)
    return (cr >= -_EPS).all(axis=-2)                 # (..., 4p)


def _edge_intersections(ca, cb):
    """All 16 segment-segment intersections of quad edges.

    ca, cb: (..., 4, 2). Returns (pts (..., 16, 2), valid (..., 16)).
    """
    p1 = ca[..., :, None, :]                          # (..., 4, 1, 2)
    p2 = jnp.roll(ca, -1, axis=-2)[..., :, None, :]
    q1 = cb[..., None, :, :]                          # (..., 1, 4, 2)
    q2 = jnp.roll(cb, -1, axis=-2)[..., None, :, :]

    d1 = p2 - p1
    d2 = q2 - q1
    denom = d1[..., 0] * d2[..., 1] - d1[..., 1] * d2[..., 0]  # (...,4,4)
    dq = q1 - p1
    t_num = dq[..., 0] * d2[..., 1] - dq[..., 1] * d2[..., 0]
    u_num = dq[..., 0] * d1[..., 1] - dq[..., 1] * d1[..., 0]
    safe = jnp.where(jnp.abs(denom) < _EPS, 1.0, denom)
    t = t_num / safe
    u = u_num / safe
    valid = ((jnp.abs(denom) >= _EPS)
             & (t >= -_EPS) & (t <= 1 + _EPS)
             & (u >= -_EPS) & (u <= 1 + _EPS))
    pts = p1 + t[..., None] * d1                      # (..., 4, 4, 2)
    shape = pts.shape[:-3] + (16, 2)
    return pts.reshape(shape), valid.reshape(shape[:-1])


def _pseudo_angle(dx, dy):
    """Monotone-in-angle key in [0, 4): one division, no arctan2.

    Within each quadrant the map t = dy/(|dx|+|dy|) (and its
    reflections) is strictly monotone in true angle, so sorting by it
    orders points around the origin exactly like arctan2 at a fraction
    of the VPU cost (arctan2 is a multi-op transcendental).
    """
    denom = jnp.abs(dx) + jnp.abs(dy)
    r = dx / jnp.maximum(denom, _EPS)
    return jnp.where(dy >= 0.0, 1.0 - r, 3.0 + r)


def _quad_intersection_area(ca, cb):
    """Intersection area of CCW quads: ca, cb (..., 4, 2) -> (...,).

    Candidate-enumeration design (see module docstring): the ≤8-vertex
    intersection polygon's vertices are a subset of 24 statically
    enumerable candidates; they are ordered by pseudo-angle around the
    valid-candidate centroid with ONE batched 24-wide multi-operand
    sort and integrated with the shoelace formula. This formulation is
    numerically robust — candidate positions carry O(eps) noise, so
    the area does too (an inside/outside flip adds or removes a
    near-duplicate vertex, changing the ring area by O(eps)) — unlike
    boundary-integral (Green) formulations whose two clip passes can
    make inconsistent float decisions on near-parallel same-direction
    edges and double-count a segment with origin-dependent error.
    """
    in_ab = _corners_inside(ca, cb)                   # (..., 4)
    in_ba = _corners_inside(cb, ca)
    inter_pts, inter_ok = _edge_intersections(ca, cb)

    cand = jnp.concatenate([ca, cb, inter_pts], axis=-2)     # (..., 24, 2)
    valid = jnp.concatenate([in_ab, in_ba, inter_ok], axis=-1)

    k = jnp.sum(valid, axis=-1)                       # (...,)
    vf = valid[..., None].astype(cand.dtype)
    centroid = (jnp.sum(cand * vf, axis=-2)
                / jnp.maximum(k, 1)[..., None])       # (..., 2)

    rel = cand - centroid[..., None, :]
    ang = _pseudo_angle(rel[..., 0], rel[..., 1])
    big = jnp.array(1e9, ang.dtype)
    key = jnp.where(valid, ang, big)                  # invalid sort last
    # Multi-operand lax.sort co-sorts coordinates with the key — XLA:TPU
    # gathers (argsort + take_along_axis) are ~100x slower than the sort
    # itself, so the ring is produced entirely gather-free.
    _, rx, ry = jax.lax.sort(
        (key, rel[..., 0], rel[..., 1]), dimension=-1, num_keys=1)

    # Ring neighbor = static roll by -1, with the wrap at position k-1
    # pointing back to element 0 — arithmetic select, no dynamic gather.
    nx_ = jnp.roll(rx, -1, axis=-1)
    ny_ = jnp.roll(ry, -1, axis=-1)
    idx = jnp.arange(24)
    is_last = idx == (k[..., None] - 1)
    nx_ = jnp.where(is_last, rx[..., :1], nx_)
    ny_ = jnp.where(is_last, ry[..., :1], ny_)

    # Shoelace in centroid-relative coordinates (better f32 behavior
    # than absolute coords far from the lidar origin).
    cross = rx * ny_ - ry * nx_
    cross = jnp.where(idx < k[..., None], cross, 0.0)
    area = 0.5 * jnp.abs(jnp.sum(cross, axis=-1))
    return jnp.where(k >= 3, area, 0.0)


@jax.jit
def rotated_iou_bev(boxes_a: jax.Array, boxes_b: jax.Array) -> jax.Array:
    """Elementwise rotated BEV IoU of 7-DoF boxes.

    boxes_a, boxes_b: broadcast-compatible (..., 7). Returns (...,).
    """
    boxes_a, boxes_b = jnp.broadcast_arrays(boxes_a, boxes_b)
    # Recenter each pair at the midpoint of the two box centers: corner
    # coordinates become O(box size) instead of O(scene extent), so the
    # f32 cross-product noise in the inside/intersection eps tests is
    # scale-matched (identical boxes 80 m from the lidar must still
    # report IoU 1.0).
    mid = 0.5 * (boxes_a[..., :2] + boxes_b[..., :2])
    shift = jnp.concatenate(
        [mid, jnp.zeros(mid.shape[:-1] + (5,), mid.dtype)], axis=-1)
    ca = boxes_to_corners_bev(boxes_a - shift)        # (..., 4, 2) CCW
    cb = boxes_to_corners_bev(boxes_b - shift)
    inter = _quad_intersection_area(ca, cb)
    area_a = boxes_a[..., 3] * boxes_a[..., 4]
    area_b = boxes_b[..., 3] * boxes_b[..., 4]
    inter = jnp.minimum(inter, jnp.minimum(area_a, area_b))
    union = area_a + area_b - inter
    return inter / jnp.maximum(union, _EPS)


def rotated_iou_matrix(
    boxes_a: jax.Array,
    boxes_b: jax.Array,
    *,
    row_chunk: int = 0,
) -> jax.Array:
    """Pairwise rotated BEV IoU: (M, 7) x (N, 7) -> (M, N).

    ``row_chunk`` > 0 evaluates the matrix in row blocks via
    ``lax.map`` to bound peak memory on large M*N (rows are padded up
    to a chunk multiple internally).
    """
    m = boxes_a.shape[0]

    def rows(a_block):
        return rotated_iou_bev(a_block[:, None, :], boxes_b[None, :, :])

    if row_chunk and m > row_chunk:
        pad = (-m) % row_chunk
        padded = jnp.concatenate(
            [boxes_a, jnp.ones((pad, 7), boxes_a.dtype)]) if pad \
            else boxes_a
        blocks = padded.reshape(-1, row_chunk, 7)
        out = jax.lax.map(rows, blocks).reshape(m + pad, -1)
        return out[:m]
    return rows(boxes_a)

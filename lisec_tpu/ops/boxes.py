"""O9/O14 — box coding and rotated-box membership (SURVEY.md §2.3).

7-DoF boxes follow the lidar-frame convention ``(x, y, z, l, w, h, yaw)``
with (x, y, z) the box *center*, l along heading, yaw about +z measured
from +x. Encoding is the diagonal-normalized residual scheme introduced
by SECOND and used by PointPillars; everything is pure jnp and runs on
device as part of the single-round-trip pipeline (BASELINE.json:5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-6


@jax.jit
def encode_boxes(boxes: jax.Array, anchors: jax.Array) -> jax.Array:
    """Residual-encode target boxes against anchors. Both (..., 7).

    (dx, dy) are normalized by the anchor BEV diagonal, dz by height,
    sizes by log-ratio, angle as plain residual (the sin-difference
    trick lives in the loss, not the coder — matching SECOND).
    """
    xa, ya, za, la, wa, ha, ra = jnp.split(anchors, 7, axis=-1)
    xg, yg, zg, lg, wg, hg, rg = jnp.split(boxes, 7, axis=-1)
    diag = jnp.sqrt(la * la + wa * wa) + _EPS
    out = jnp.concatenate([
        (xg - xa) / diag,
        (yg - ya) / diag,
        (zg - za) / (ha + _EPS),
        jnp.log(lg / (la + _EPS) + _EPS),
        jnp.log(wg / (wa + _EPS) + _EPS),
        jnp.log(hg / (ha + _EPS) + _EPS),
        rg - ra,
    ], axis=-1)
    return out


def encode_boxes_cols(boxes: jax.Array, anchors: jax.Array) -> jax.Array:
    """:func:`encode_boxes` on CHANNEL-LEADING columns: both
    (..., 7, N) -> (..., 7, N).

    Same arithmetic, different layout: a (N, 7) array tiles its 7-wide
    minor dim to 128 lanes on TPU (18x HBM/VPU bloat on every pass —
    the round-5 train-step profile put ~9.5 ms/batch-4 of loss glue on
    such layouts), while (7, N) puts the box channels on SUBLANES
    (7 -> 8, ~1.14x) and keeps N on dense 128-lane tiles.
    """
    xa, ya, za, la, wa, ha, ra = (anchors[..., i, :] for i in range(7))
    xg, yg, zg, lg, wg, hg, rg = (boxes[..., i, :] for i in range(7))
    diag = jnp.sqrt(la * la + wa * wa) + _EPS
    return jnp.stack([
        (xg - xa) / diag,
        (yg - ya) / diag,
        (zg - za) / (ha + _EPS),
        jnp.log(lg / (la + _EPS) + _EPS),
        jnp.log(wg / (wa + _EPS) + _EPS),
        jnp.log(hg / (ha + _EPS) + _EPS),
        rg - ra,
    ], axis=-2)


@jax.jit
def decode_boxes(deltas: jax.Array, anchors: jax.Array) -> jax.Array:
    """Inverse of :func:`encode_boxes`. Both (..., 7)."""
    xa, ya, za, la, wa, ha, ra = jnp.split(anchors, 7, axis=-1)
    tx, ty, tz, tl, tw, th, tr = jnp.split(deltas, 7, axis=-1)
    # Clamp size residuals so untrained/garbage logits cannot decode to
    # inf-sized boxes (exp overflow) downstream in NMS/eval.
    tl, tw, th = (jnp.clip(t, -10.0, 4.0) for t in (tl, tw, th))
    diag = jnp.sqrt(la * la + wa * wa)
    return jnp.concatenate([
        tx * diag + xa,
        ty * diag + ya,
        tz * ha + za,
        jnp.exp(tl) * la,
        jnp.exp(tw) * wa,
        jnp.exp(th) * ha,
        tr + ra,
    ], axis=-1)


def boxes_to_corners_bev(boxes: jax.Array) -> jax.Array:
    """BEV corners of yawed boxes: (..., 7) -> (..., 4, 2).

    Corner order is counter-clockwise starting front-left in the box
    frame: (+l/2,+w/2), (-l/2,+w/2), (-l/2,-w/2), (+l/2,-w/2).
    """
    x, y = boxes[..., 0], boxes[..., 1]
    l, w = boxes[..., 3], boxes[..., 4]
    yaw = boxes[..., 6]
    dx = jnp.stack([l / 2, -l / 2, -l / 2, l / 2], axis=-1)
    dy = jnp.stack([w / 2, w / 2, -w / 2, -w / 2], axis=-1)
    c, s = jnp.cos(yaw)[..., None], jnp.sin(yaw)[..., None]
    cx = x[..., None] + dx * c - dy * s
    cy = y[..., None] + dx * s + dy * c
    return jnp.stack([cx, cy], axis=-1)


@jax.jit
def points_in_rbbox(points: jax.Array, boxes: jax.Array) -> jax.Array:
    """O14 — membership of points in rotated 3D boxes.

    points: (N, >=3); boxes: (B, 7). Returns (N, B) bool. Points on the
    boundary count as inside (<= on half-extents).
    """
    xyz = points[:, None, :3] - boxes[None, :, :3]              # (N, B, 3)
    yaw = boxes[None, :, 6]
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    # Rotate into the box frame (inverse rotation).
    local_x = xyz[..., 0] * c + xyz[..., 1] * s
    local_y = -xyz[..., 0] * s + xyz[..., 1] * c
    local_z = xyz[..., 2]
    l, w, h = boxes[None, :, 3], boxes[None, :, 4], boxes[None, :, 5]
    return (
        (jnp.abs(local_x) <= l / 2)
        & (jnp.abs(local_y) <= w / 2)
        & (jnp.abs(local_z) <= h / 2)
    )

"""O11 — rotated NMS, fully on device (SURVEY.md §2.3 O11).

Reference form: CUDA bitmask NMS with host-side thresholding. TPU-native
design: fixed-size greedy suppression — top-k pre-select (``nms_pre``),
pairwise rotated-IoU matrix computed once, then a ``fori_loop`` over the
k score-sorted boxes updating a keep mask. Everything static-shape, so
the whole detector (decode + NMS) stays inside one jitted program and
the cloud makes a single host<->device round trip (BASELINE.json:5).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lisec_tpu.ops.rotated_iou import rotated_iou_matrix


class NMSResult(NamedTuple):
    boxes: jax.Array      # (nms_post, 7)
    scores: jax.Array     # (nms_post,)
    labels: jax.Array     # (nms_post,) int32
    valid: jax.Array      # (nms_post,) bool


@partial(jax.jit, static_argnames=("nms_pre", "nms_post", "row_chunk"))
def rotated_nms(
    boxes: jax.Array,
    scores: jax.Array,
    labels: jax.Array,
    *,
    iou_threshold: float,
    score_threshold: float = 0.0,
    nms_pre: int = 1024,
    nms_post: int = 128,
    row_chunk: int = 128,
) -> NMSResult:
    """Greedy class-aware rotated NMS over one cloud's detections.

    boxes: (A, 7); scores: (A,); labels: (A,) int32. Boxes of different
    classes never suppress each other (IoU is masked by label equality).
    """
    # Top-k preselect by score (static k).
    top_scores, order = jax.lax.top_k(scores, nms_pre)
    top_boxes = boxes[order]
    top_labels = labels[order]
    alive = top_scores > score_threshold

    iou = rotated_iou_matrix(top_boxes, top_boxes, row_chunk=row_chunk)
    same_class = top_labels[:, None] == top_labels[None, :]
    suppress = (iou > iou_threshold) & same_class

    def body(i, keep):
        kept_i = keep[i]
        # Suppress all later boxes overlapping box i (if i survives).
        later = jnp.arange(nms_pre) > i
        kill = suppress[i] & later & kept_i
        return keep & ~kill

    keep = jax.lax.fori_loop(0, nms_pre, body, alive)

    # Compact kept boxes to the front, score order preserved.
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    slot = jnp.where(keep & (rank < nms_post), rank, nms_post)
    out_boxes = jnp.zeros((nms_post + 1, 7), boxes.dtype).at[slot].set(
        top_boxes, mode="drop")[:nms_post]
    out_scores = jnp.zeros((nms_post + 1,), scores.dtype).at[slot].set(
        top_scores, mode="drop")[:nms_post]
    out_labels = jnp.full((nms_post + 1,), -1, jnp.int32).at[slot].set(
        top_labels, mode="drop")[:nms_post]
    out_valid = jnp.zeros((nms_post + 1,), bool).at[slot].set(
        keep, mode="drop")[:nms_post]
    return NMSResult(out_boxes, out_scores, out_labels, out_valid)

"""R3 — anchor generation + target assignment (SURVEY.md §2.5 R3).

Anchors: one size per class (e.g. car (3.9, 1.6, 1.56)), two yaws
(0, pi/2), laid on the BEV output grid. Matching is by rotated BEV IoU
(O10) with per-class pos/neg thresholds (car 0.6/0.45), a forced match
for each gt's best anchor, and everything in between ignored — the
SECOND/PointPillars recipe [arch]. Runs fully on device inside the
jitted train step (the reference class does this on CPU in the
dataloader; either side of the boundary is contract-legal, SURVEY.md
§3.2 — on-device keeps the host feed trivial).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lisec_tpu.ops.boxes import encode_boxes
from lisec_tpu.ops.rotated_iou import rotated_iou_matrix


class AnchorConfig(NamedTuple):
    """Per-class anchor spec."""

    size: Tuple[float, float, float]      # (l, w, h)
    z_center: float
    pos_threshold: float
    neg_threshold: float


DEFAULT_ANCHORS = {
    "Car": AnchorConfig((3.9, 1.6, 1.56), -1.0, 0.6, 0.45),
    "Pedestrian": AnchorConfig((0.8, 0.6, 1.73), -0.6, 0.5, 0.35),
    "Cyclist": AnchorConfig((1.76, 0.6, 1.73), -0.6, 0.5, 0.35),
}

ROTATIONS = (0.0, np.pi / 2)


def generate_anchors(
    anchor_cfgs: Sequence[AnchorConfig],
    *,
    pc_range: Tuple[float, ...],
    feature_map_size: Tuple[int, int],     # (ny_out, nx_out)
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Dense anchor grid matching the head's (y, x, class, rot) layout.

    Returns (anchors (A, 7) f32, anchor_classes (A,) i32,
    pos_thr (A,), neg_thr (A,)) as host numpy (baked into the jitted
    program as constants).
    """
    ny, nx = feature_map_size
    xs = np.linspace(pc_range[0], pc_range[3], nx, endpoint=False) \
        + (pc_range[3] - pc_range[0]) / nx / 2
    ys = np.linspace(pc_range[1], pc_range[4], ny, endpoint=False) \
        + (pc_range[4] - pc_range[1]) / ny / 2

    anchors, classes, pos_t, neg_t = [], [], [], []
    for y in ys:
        for x in xs:
            for ci, cfg in enumerate(anchor_cfgs):
                for rot in ROTATIONS:
                    l, w, h = cfg.size
                    anchors.append([x, y, cfg.z_center, l, w, h, rot])
                    classes.append(ci)
                    pos_t.append(cfg.pos_threshold)
                    neg_t.append(cfg.neg_threshold)
    return (np.asarray(anchors, np.float32),
            np.asarray(classes, np.int32),
            np.asarray(pos_t, np.float32),
            np.asarray(neg_t, np.float32))


class AssignResult(NamedTuple):
    cls_targets: jax.Array      # (A,) int32: -1 ignore, 0 bg, c+1 fg
    reg_targets: jax.Array      # (A, 7) encoded residuals
    dir_targets: jax.Array      # (A,) int32 direction bin
    positive: jax.Array         # (A,) bool


@partial(jax.jit, static_argnames=("row_chunk",))
def assign_targets(
    anchors: jax.Array,
    anchor_classes: jax.Array,
    pos_thr: jax.Array,
    neg_thr: jax.Array,
    gt_boxes: jax.Array,
    gt_classes: jax.Array,
    gt_mask: jax.Array,
    *,
    row_chunk: int = 0,
) -> AssignResult:
    """Single-frame assignment: anchors (A, 7) vs gt (M, 7)."""
    a = anchors.shape[0]
    m = gt_boxes.shape[0]

    iou = rotated_iou_matrix(anchors, gt_boxes, row_chunk=row_chunk)  # (A,M)
    valid = gt_mask.astype(bool)[None, :] \
        & (anchor_classes[:, None] == gt_classes[None, :])
    iou = jnp.where(valid, iou, -1.0)

    best_gt = jnp.argmax(iou, axis=1)                       # (A,)
    best_iou = jnp.max(iou, axis=1)

    # Forced match: each valid gt claims its best anchor (ties -> lowest
    # anchor index). Standard recipe guarantees every gt is learned.
    best_anchor_per_gt = jnp.argmax(iou, axis=0)            # (M,)
    gt_has_overlap = jnp.max(iou, axis=0) > 0
    # A padded gt's IoU column is all -1, so its argmax is anchor 0 —
    # route those writes out of range (mode='drop') so duplicate-index
    # scatter order can never clobber a real gt's claim at anchor 0.
    gt_claims = gt_mask.astype(bool) & gt_has_overlap
    claim_idx = jnp.where(gt_claims, best_anchor_per_gt, a)
    forced = jnp.zeros((a,), bool).at[claim_idx].set(True, mode="drop")
    # The forced anchor's best_gt must be the gt that claimed it.
    claimed_gt = jnp.zeros((a,), jnp.int32).at[claim_idx].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop")
    best_gt = jnp.where(forced, claimed_gt, best_gt)

    positive = (best_iou >= pos_thr) | forced
    negative = (best_iou < neg_thr) & ~positive

    matched_boxes = gt_boxes[best_gt]                       # (A, 7)
    matched_cls = gt_classes[best_gt]
    reg_targets = encode_boxes(matched_boxes, anchors)
    # Direction bin from the gt's absolute yaw (SECOND convention).
    dir_targets = (jnp.mod(matched_boxes[:, 6], 2 * jnp.pi)
                   < jnp.pi).astype(jnp.int32)

    cls_targets = jnp.where(
        positive, matched_cls + 1,
        jnp.where(negative, 0, -1)).astype(jnp.int32)
    return AssignResult(cls_targets, reg_targets, dir_targets, positive)

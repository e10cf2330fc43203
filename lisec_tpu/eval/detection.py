"""Host-side detection matching utilities (numpy).

Shared by the light recall eval (pipelines.detection.evaluate) and the
full KITTI AP evaluator (O15, eval.kitti_ap). Rotated BEV IoU here is
an independent eager implementation (polygon clipping), also usable as
an oracle cross-check of the device op.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _corners(box: np.ndarray) -> np.ndarray:
    x, y, l, w, yaw = box[0], box[1], box[3], box[4], box[6]
    local = np.array([[l / 2, w / 2], [-l / 2, w / 2],
                      [-l / 2, -w / 2], [l / 2, -w / 2]])
    c, s = np.cos(yaw), np.sin(yaw)
    rot = np.array([[c, -s], [s, c]])
    return local @ rot.T + np.array([x, y])


def _clip(poly, p1, p2):
    def cross2(u, v):
        return u[0] * v[1] - u[1] * v[0]

    out = []
    for i in range(len(poly)):
        a, b = poly[i], poly[(i + 1) % len(poly)]
        sa = cross2(p2 - p1, a - p1)
        sb = cross2(p2 - p1, b - p1)
        if sa >= -1e-8:
            out.append(a)
        if (sa >= -1e-8) != (sb >= -1e-8):
            out.append(a + sa / (sa - sb) * (b - a))
    return out


def _area(poly) -> float:
    if len(poly) < 3:
        return 0.0
    s = 0.0
    for i in range(len(poly)):
        a, b = poly[i], poly[(i + 1) % len(poly)]
        s += a[0] * b[1] - a[1] * b[0]
    return abs(s) / 2.0


def rotated_iou_bev_np(box_a: np.ndarray, box_b: np.ndarray) -> float:
    poly = list(_corners(box_a))
    cb = _corners(box_b)
    for k in range(4):
        poly = _clip(poly, cb[k], cb[(k + 1) % 4])
        if not poly:
            return 0.0
    inter = _area(poly)
    union = box_a[3] * box_a[4] + box_b[3] * box_b[4] - inter
    return float(inter / max(union, 1e-8))


def iou_3d_np(box_a: np.ndarray, box_b: np.ndarray) -> float:
    """Rotated 3D IoU: BEV intersection x z-overlap."""
    poly = list(_corners(box_a))
    cb = _corners(box_b)
    for k in range(4):
        poly = _clip(poly, cb[k], cb[(k + 1) % 4])
        if not poly:
            return 0.0
    inter_bev = _area(poly)
    za0, za1 = box_a[2] - box_a[5] / 2, box_a[2] + box_a[5] / 2
    zb0, zb1 = box_b[2] - box_b[5] / 2, box_b[2] + box_b[5] / 2
    zi = max(0.0, min(za1, zb1) - max(za0, zb0))
    inter = inter_bev * zi
    vol_a = box_a[3] * box_a[4] * box_a[5]
    vol_b = box_b[3] * box_b[4] * box_b[5]
    return float(inter / max(vol_a + vol_b - inter, 1e-8))


def match_frame(det_boxes, det_labels, gt_boxes, gt_classes,
                *, iou_threshold: float = 0.5) -> Dict[str, int]:
    """Greedy one-to-one matching of detections to gt (BEV IoU)."""
    hit = np.zeros(len(gt_boxes), bool)
    for db, dl in zip(det_boxes, det_labels):
        for gi, (gb, gc) in enumerate(zip(gt_boxes, gt_classes)):
            if hit[gi] or gc != dl:
                continue
            if rotated_iou_bev_np(db, gb) >= iou_threshold:
                hit[gi] = True
                break
    return {
        "num_gt": int(len(gt_boxes)),
        "num_hit": int(hit.sum()),
        "num_det": int(len(det_boxes)),
    }

"""O15 — KITTI detection AP evaluation (SURVEY.md §2.3 O15).

Reference form: numba/C++ rotated-IoU + AP loop. Here: host-side numpy
(correctness-critical, not perf-critical). Implements the KITTI
protocol: per-class IoU thresholds (car 0.7, pedestrian/cyclist 0.5),
Easy/Moderate/Hard difficulty buckets with ignored-gt semantics, greedy
score-ordered matching, and both 11-point (original) and 40-point
interpolated AP. Metrics: 3D IoU (BEV polygon x z-overlap) and BEV IoU.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from lisec_tpu.eval.detection import iou_3d_np, rotated_iou_bev_np

CLASS_IOU_THRESHOLDS = {0: 0.7, 1: 0.5, 2: 0.5}   # Car, Pedestrian, Cyclist
DIFFICULTY_NAMES = ("easy", "moderate", "hard")


def _match_frame(det_boxes, det_scores, gt_boxes, gt_ignored,
                 iou_thr, metric) -> List:
    """Greedy matching in score order for one frame.

    Returns per-detection outcome list: (score, kind) with kind in
    {"tp", "fp", "ignore"}. Each gt is matched at most once.
    """
    iou_fn = iou_3d_np if metric == "3d" else rotated_iou_bev_np
    order = np.argsort(-det_scores, kind="stable")
    taken = np.zeros(len(gt_boxes), bool)
    out = []
    for di in order:
        best_iou, best_gi = 0.0, -1
        for gi in range(len(gt_boxes)):
            if taken[gi]:
                continue
            iou = iou_fn(det_boxes[di], gt_boxes[gi])
            if iou >= iou_thr and iou > best_iou:
                best_iou, best_gi = iou, gi
        if best_gi < 0:
            out.append((det_scores[di], "fp"))
        elif gt_ignored[best_gi]:
            taken[best_gi] = True
            out.append((det_scores[di], "ignore"))
        else:
            taken[best_gi] = True
            out.append((det_scores[di], "tp"))
    return out


def _average_precision(outcomes, num_gt, num_points) -> float:
    """AP from pooled detection outcomes via interpolated PR curve."""
    if num_gt == 0:
        return 0.0
    outcomes = sorted(
        [o for o in outcomes if o[1] != "ignore"],
        key=lambda x: -x[0])
    tp = np.cumsum([1 if k == "tp" else 0 for _, k in outcomes])
    fp = np.cumsum([1 if k == "fp" else 0 for _, k in outcomes])
    if len(tp) == 0:
        return 0.0
    recall = tp / num_gt
    precision = tp / np.maximum(tp + fp, 1)
    # Monotone envelope.
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    if num_points == 11:
        samples = np.linspace(0.0, 1.0, 11)
    else:
        samples = np.linspace(1.0 / 40, 1.0, 40)
    ap = 0.0
    for r in samples:
        idx = np.searchsorted(recall, r, side="left")
        ap += precision[idx] if idx < len(precision) else 0.0
    return float(ap / len(samples) * 100.0)


def evaluate_kitti_ap(
    detections: Sequence[Dict[str, np.ndarray]],
    ground_truths: Sequence[Dict[str, np.ndarray]],
    *,
    class_ids: Sequence[int] = (0,),
    metric: str = "3d",
    num_points: int = 40,
) -> Dict[str, float]:
    """KITTI AP over a dataset.

    detections: per frame {'boxes' (D,7), 'scores' (D,), 'labels' (D,)}.
    ground_truths: per frame {'boxes' (G,7), 'classes' (G,),
                   'difficulty' (G,) int (-1 = ignore always)}.
    Returns {'<cls>_<metric>_ap_<difficulty>': AP in percent}.
    """
    results = {}
    for cls in class_ids:
        iou_thr = CLASS_IOU_THRESHOLDS.get(cls, 0.5)
        for bucket, bucket_name in enumerate(DIFFICULTY_NAMES):
            outcomes, num_gt = [], 0
            for det, gt in zip(detections, ground_truths):
                sel = det["labels"] == cls
                g_cls = gt["classes"] == cls
                diff = gt.get(
                    "difficulty",
                    np.zeros(len(gt["boxes"]), np.int32))
                # Current-bucket gts count; harder/unknown ones are
                # "ignored": matching them is neither TP nor FP.
                g_valid = g_cls & (diff >= 0) & (diff <= bucket)
                g_ignored_mask = g_cls & ~g_valid
                keep = g_cls
                boxes = gt["boxes"][keep]
                ignored = g_ignored_mask[keep]
                num_gt += int(g_valid.sum())
                outcomes.extend(_match_frame(
                    det["boxes"][sel], det["scores"][sel],
                    boxes, ignored, iou_thr, metric))
            results[f"class{cls}_{metric}_ap_{bucket_name}"] = \
                _average_precision(outcomes, num_gt, num_points)
    return results


def evaluate_pipeline_ap(pipeline, state, *, split: str = "val",
                         metric: str = "3d",
                         max_frames: int = 0) -> Dict[str, float]:
    """Run inference over a split and compute KITTI AP (A1 glue)."""
    import jax
    from lisec_tpu.data.collate import make_batches

    cfg = pipeline.cfg
    ds = pipeline.make_dataset(split)
    dets, gts = [], []
    done = 0
    for batch in make_batches(ds, cfg.budget, cfg.train.batch_size,
                              shuffle=False, epochs=1):
        out = jax.device_get(pipeline.infer(state, batch))
        for i in range(len(batch["points"])):
            v = out["valid"][i]
            dets.append({
                "boxes": out["boxes"][i][v],
                "scores": out["scores"][i][v],
                "labels": out["labels"][i][v],
            })
            gm = batch["gt_mask"][i]
            gts.append({
                "boxes": batch["gt_boxes"][i][gm],
                "classes": batch["gt_classes"][i][gm],
                "difficulty": batch.get(
                    "difficulty",
                    np.zeros_like(batch["gt_classes"]))[i][gm],
            })
            done += 1
        if max_frames and done >= max_frames:
            break
    return evaluate_kitti_ap(
        dets, gts,
        class_ids=list(range(len(pipeline.class_names))),
        metric=metric)

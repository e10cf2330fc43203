"""O15 unit tests: KITTI AP evaluator on synthetic detections."""

import numpy as np

from lisec_tpu.eval.kitti_ap import evaluate_kitti_ap


def _gt_frame(rng, n=4):
    boxes = np.stack([
        rng.uniform(0, 60, n), rng.uniform(-30, 30, n),
        np.full(n, -1.0), np.full(n, 3.9), np.full(n, 1.6),
        np.full(n, 1.56), rng.uniform(-np.pi, np.pi, n)], -1
    ).astype(np.float32)
    return {
        "boxes": boxes,
        "classes": np.zeros(n, np.int32),
        "difficulty": np.zeros(n, np.int32),
    }


def test_perfect_detections_ap_100():
    rng = np.random.default_rng(0)
    gts = [_gt_frame(rng) for _ in range(5)]
    dets = [{
        "boxes": g["boxes"].copy(),
        "scores": np.linspace(0.9, 0.6, len(g["boxes"])).astype(np.float32),
        "labels": np.zeros(len(g["boxes"]), np.int32),
    } for g in gts]
    res = evaluate_kitti_ap(dets, gts, class_ids=[0], metric="3d")
    assert res["class0_3d_ap_moderate"] > 99.0


def test_no_detections_ap_0():
    rng = np.random.default_rng(0)
    gts = [_gt_frame(rng)]
    dets = [{"boxes": np.zeros((0, 7), np.float32),
             "scores": np.zeros(0, np.float32),
             "labels": np.zeros(0, np.int32)}]
    res = evaluate_kitti_ap(dets, gts, class_ids=[0])
    assert res["class0_3d_ap_moderate"] == 0.0


def test_half_detections():
    rng = np.random.default_rng(1)
    gts = [_gt_frame(rng, n=4) for _ in range(4)]
    dets = []
    for g in gts:
        dets.append({
            "boxes": g["boxes"][:2].copy(),
            "scores": np.asarray([0.9, 0.8], np.float32),
            "labels": np.zeros(2, np.int32),
        })
    res = evaluate_kitti_ap(dets, gts, class_ids=[0])
    ap = res["class0_3d_ap_moderate"]
    assert 40.0 < ap < 60.0   # recall caps at 0.5 with perfect precision


def test_false_positives_lower_ap():
    rng = np.random.default_rng(2)
    gts = [_gt_frame(rng, n=4)]
    far = _gt_frame(np.random.default_rng(99), n=4)["boxes"]
    far[:, 0] += 100   # never overlaps
    dets = [{
        "boxes": np.concatenate([gts[0]["boxes"], far]),
        # FPs score higher than TPs -> precision suffers early.
        "scores": np.asarray([0.5, 0.45, 0.4, 0.35, 0.9, 0.85, 0.8, 0.75],
                             np.float32),
        "labels": np.zeros(8, np.int32),
    }]
    res = evaluate_kitti_ap(dets, gts, class_ids=[0])
    assert res["class0_3d_ap_moderate"] < 60.0


def test_harder_gts_ignored_not_fn():
    rng = np.random.default_rng(3)
    gt = _gt_frame(rng, n=4)
    gt["difficulty"] = np.asarray([0, 0, 2, 2], np.int32)  # 2 hard gts
    # Detect only the two easy ones.
    dets = [{
        "boxes": gt["boxes"][:2].copy(),
        "scores": np.asarray([0.9, 0.8], np.float32),
        "labels": np.zeros(2, np.int32),
    }]
    res = evaluate_kitti_ap([dets[0]], [gt], class_ids=[0])
    # In the EASY bucket the two hard gts are ignored -> full recall.
    assert res["class0_3d_ap_easy"] > 99.0
    # In the HARD bucket they count -> recall 0.5.
    assert res["class0_3d_ap_hard"] < 60.0

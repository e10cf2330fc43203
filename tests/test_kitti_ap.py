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


class TestMatrixMatcher:
    """The matrix-based greedy matcher (one (D, G) IoU per frame,
    reused across buckets) must reproduce the pairwise reference."""

    def test_matches_pairwise_reference(self):
        from lisec_tpu.eval.detection import iou_matrix_np
        from lisec_tpu.eval.kitti_ap import (
            _match_frame, _match_frame_pairs)
        rng = np.random.default_rng(7)
        for trial in range(20):
            g = _gt_frame(rng, n=int(rng.integers(0, 8)))
            nd = int(rng.integers(0, 12))
            det = _gt_frame(rng, n=nd)["boxes"]
            if nd and len(g["boxes"]):
                # overlap some detections with gts
                k = min(nd, len(g["boxes"]))
                det[:k] = g["boxes"][:k] + rng.normal(0, 0.3, (k, 7))
                det[:, 3:6] = np.abs(det[:, 3:6]) + 0.5
            scores = rng.uniform(0, 1, nd).astype(np.float32)
            ignored = rng.random(len(g["boxes"])) < 0.3
            for metric in ("3d", "bev"):
                ref = _match_frame_pairs(
                    det, scores, g["boxes"], ignored, 0.5, metric)
                iou = iou_matrix_np(np.asarray(det, np.float64),
                                    np.asarray(g["boxes"], np.float64),
                                    metric)
                got = _match_frame(scores, iou, ignored, 0.5)
                assert [k for _, k in ref] == [k for _, k in got], \
                    (trial, metric, ref, got)

    def test_scales_to_val_sized_input(self):
        """Smoke the evaluator at a KITTI-val-shaped load (a slice of
        it — the full 3,769-frame dryrun lives in benchmarks/)."""
        import time
        from lisec_tpu.eval.kitti_ap import (
            evaluate_kitti_ap, evaluate_kitti_ap_official)
        rng = np.random.default_rng(11)
        gts, dets = [], []
        for _ in range(200):
            g = _gt_frame(rng, n=10)
            g["difficulty"] = rng.integers(0, 3, 10).astype(np.int32)
            gts.append(g)
            det = g["boxes"] + rng.normal(0, 0.2, (10, 7))
            det[:, 3:6] = np.abs(det[:, 3:6]) + 0.5
            far = det.copy()
            far[:, 0] += 90.0
            dets.append({
                "boxes": np.concatenate([det, far]).astype(np.float32),
                "scores": rng.uniform(0, 1, 20).astype(np.float32),
                "labels": np.zeros(20, np.int32),
            })
        t0 = time.perf_counter()
        evaluate_kitti_ap(dets, gts, class_ids=[0], metric="3d")
        evaluate_kitti_ap_official(dets, gts, class_ids=[0], metric="3d")
        dt = time.perf_counter() - t0
        # 200 frames in well under a minute -> 3,769 in ~minutes even
        # on this 1-core host (the pairwise matcher took >1 s/frame).
        assert dt < 60.0, f"AP eval too slow: {dt:.1f}s for 200 frames"


class TestIoUMatrix:
    def test_matches_pairwise(self):
        from lisec_tpu.eval.detection import (
            iou_3d_np, iou_matrix_np, rotated_iou_bev_np)
        rng = np.random.default_rng(3)
        det = np.stack([
            rng.uniform(0, 40, 12), rng.uniform(-20, 20, 12),
            rng.uniform(-2, 0, 12), rng.uniform(2, 5, 12),
            rng.uniform(1.2, 2, 12), rng.uniform(1.2, 2, 12),
            rng.uniform(-np.pi, np.pi, 12)], -1)
        gt = det[:7] + rng.normal(0, 0.4, (7, 7))
        gt[:, 3:6] = np.abs(gt[:, 3:6]) + 0.5
        for metric, pair_fn in [("bev", rotated_iou_bev_np),
                                ("3d", iou_3d_np)]:
            mat = iou_matrix_np(det, gt, metric)
            for i in range(len(det)):
                for j in range(len(gt)):
                    np.testing.assert_allclose(
                        mat[i, j], pair_fn(det[i], gt[j]), atol=2e-4)

    def test_empty(self):
        from lisec_tpu.eval.detection import iou_matrix_np
        assert iou_matrix_np(np.zeros((0, 7)), np.zeros((3, 7))).shape \
            == (0, 3)


class TestOfficialProtocol:
    def test_perfect_detections_ap_100(self):
        from lisec_tpu.eval.kitti_ap import evaluate_kitti_ap_official
        rng = np.random.default_rng(0)
        # >= 41 pooled gts so every official recall sample is reachable
        # (the devkit emits at most one threshold per TP score; with
        # fewer gts than samples, AP is quantization-capped by design).
        gts = [_gt_frame(rng, n=6) for _ in range(12)]
        dets = [{
            "boxes": g["boxes"].copy(),
            "scores": rng.uniform(0.5, 1.0,
                                  len(g["boxes"])).astype(np.float32),
            "labels": np.zeros(len(g["boxes"]), np.int32),
        } for g in gts]
        res = evaluate_kitti_ap_official(dets, gts, class_ids=[0],
                                         metric="3d")
        assert res["class0_3d_ap_moderate_official"] > 97.0

    def test_no_detections_ap_0(self):
        from lisec_tpu.eval.kitti_ap import evaluate_kitti_ap_official
        rng = np.random.default_rng(0)
        gts = [_gt_frame(rng)]
        dets = [{"boxes": np.zeros((0, 7), np.float32),
                 "scores": np.zeros(0, np.float32),
                 "labels": np.zeros(0, np.int32)}]
        res = evaluate_kitti_ap_official(dets, gts, class_ids=[0])
        assert res["class0_3d_ap_moderate_official"] == 0.0

    def test_half_recall_half_ap(self):
        from lisec_tpu.eval.kitti_ap import evaluate_kitti_ap_official
        rng = np.random.default_rng(1)
        gts = [_gt_frame(rng, n=8) for _ in range(4)]
        # detect only the first half of every frame's gts, perfectly
        dets = [{
            "boxes": g["boxes"][:4].copy(),
            "scores": np.linspace(0.95, 0.7, 4).astype(np.float32),
            "labels": np.zeros(4, np.int32),
        } for g in gts]
        res = evaluate_kitti_ap_official(dets, gts, class_ids=[0],
                                         metric="3d")
        ap = res["class0_3d_ap_moderate_official"]
        assert 30.0 < ap < 60.0, ap

    def test_fp_lowers_ap(self):
        from lisec_tpu.eval.kitti_ap import evaluate_kitti_ap_official
        rng = np.random.default_rng(2)
        gts = [_gt_frame(rng, n=6) for _ in range(4)]
        dets = []
        for g in gts:
            fps = g["boxes"].copy()
            fps[:, 0] += 15.0           # far-off clones = pure FPs
            dets.append({
                "boxes": np.concatenate([g["boxes"], fps]),
                "scores": np.concatenate([
                    np.full(6, 0.9), np.full(6, 0.8)]).astype(np.float32),
                "labels": np.zeros(12, np.int32),
            })
        res = evaluate_kitti_ap_official(dets, gts, class_ids=[0],
                                         metric="3d")
        ap = res["class0_3d_ap_moderate_official"]
        assert 30.0 < ap < 80.0, ap

    def test_ignored_gts_absorb_without_fp(self):
        from lisec_tpu.eval.kitti_ap import evaluate_kitti_ap_official
        rng = np.random.default_rng(4)
        # Detections on ignored (harder-bucket) gts must be absorbed —
        # not counted as FPs — so the same detection set scores HIGHER
        # when its extras sit on ignored gts than when they are true
        # FPs in empty space. (Absolute AP here is quantization-capped
        # by the tiny pooled-gt count; compare, don't threshold.)
        gts_a, gts_b, dets = [], [], []
        for _ in range(8):
            g = _gt_frame(rng, n=6)
            g["difficulty"][3:] = 2      # hard-only: ignored for easy
            g2 = {k: v.copy() for k, v in g.items()}
            boxes = g["boxes"].copy()
            g2["boxes"][3:, 0] += 25.0   # move ignored gts away ->
            #                              those dets become true FPs
            dets.append({
                "boxes": boxes,
                "scores": rng.uniform(0.5, 1.0, 6).astype(np.float32),
                "labels": np.zeros(6, np.int32),
            })
            gts_a.append(g)
            gts_b.append(g2)
        ap_absorbed = evaluate_kitti_ap_official(
            dets, gts_a, class_ids=[0],
            metric="3d")["class0_3d_ap_easy_official"]
        ap_fp = evaluate_kitti_ap_official(
            dets, gts_b, class_ids=[0],
            metric="3d")["class0_3d_ap_easy_official"]
        assert ap_absorbed > ap_fp + 5.0, (ap_absorbed, ap_fp)

    def test_agrees_with_simple_on_clean_data(self):
        from lisec_tpu.eval.kitti_ap import (
            evaluate_kitti_ap, evaluate_kitti_ap_official)
        rng = np.random.default_rng(5)
        gts = [_gt_frame(rng, n=6) for _ in range(6)]
        dets = []
        for g in gts:
            keep = rng.random(6) < 0.75
            noisy = g["boxes"][keep].copy()
            noisy[:, :2] += rng.normal(0, 0.15, noisy[:, :2].shape)
            dets.append({
                "boxes": noisy.astype(np.float32),
                "scores": rng.uniform(0.5, 1.0,
                                      keep.sum()).astype(np.float32),
                "labels": np.zeros(int(keep.sum()), np.int32),
            })
        simple = evaluate_kitti_ap(dets, gts, class_ids=[0], metric="3d")
        official = evaluate_kitti_ap_official(dets, gts, class_ids=[0],
                                              metric="3d")
        a = simple["class0_3d_ap_moderate"]
        b = official["class0_3d_ap_moderate_official"]
        assert abs(a - b) < 12.0, (a, b)

"""KITTI-val-scale dryrun of the AP evaluator (O15; r3 verdict #5).

Generates 3,769 synthetic frames at realistic det/gt counts and times
the full evaluation: both protocols (simple + official devkit), both
metrics (3d + bev), all three difficulty buckets. Target: <= ~2 min on
this 1-core host (the pairwise matcher needed tens of millions of
interpreted polygon clips and would have taken hours).

Run: python benchmarks/eval_ap_scale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_val(rng, frames=3769, gts_per_frame=12, dets_per_frame=24):
    gts, dets = [], []
    for _ in range(frames):
        n = int(rng.integers(1, gts_per_frame + 1))
        boxes = np.stack([
            rng.uniform(0, 69, n), rng.uniform(-39, 39, n),
            rng.uniform(-2, 0, n), rng.uniform(3.2, 4.6, n),
            rng.uniform(1.4, 1.9, n), rng.uniform(1.4, 1.8, n),
            rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
        gts.append({
            "boxes": boxes,
            "classes": np.zeros(n, np.int32),
            "difficulty": rng.integers(0, 3, n).astype(np.int32),
        })
        d = int(rng.integers(n, dets_per_frame + 1))
        det = np.repeat(boxes, -(-d // n), axis=0)[:d].copy()
        det[:, :2] += rng.normal(0, 0.35, (d, 2))
        det[d // 2:, 0] += rng.uniform(8, 60, d - d // 2)  # FPs
        dets.append({
            "boxes": det.astype(np.float32),
            "scores": rng.uniform(0, 1, d).astype(np.float32),
            "labels": np.zeros(d, np.int32),
        })
    return dets, gts


def main():
    from lisec_tpu.eval.kitti_ap import (
        evaluate_kitti_ap, evaluate_kitti_ap_official)

    rng = np.random.default_rng(0)
    dets, gts = make_val(rng)
    n_det = sum(len(d["scores"]) for d in dets)
    n_gt = sum(len(g["classes"]) for g in gts)
    print(f"{len(dets)} frames, {n_det} detections, {n_gt} gts")

    t0 = time.perf_counter()
    out = {}
    for metric in ("3d", "bev"):
        out.update(evaluate_kitti_ap(
            dets, gts, class_ids=[0], metric=metric))
        out.update(evaluate_kitti_ap_official(
            dets, gts, class_ids=[0], metric=metric))
    dt = time.perf_counter() - t0
    for k, v in sorted(out.items()):
        print(f"  {k}: {v:.2f}")
    print(f"full val-scale AP eval (2 protocols x 2 metrics x 3 "
          f"buckets): {dt:.1f} s")


if __name__ == "__main__":
    main()

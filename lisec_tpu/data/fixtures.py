"""Synthetic fixture datasets (SURVEY.md §4 "Data" row).

Real datasets are not on this machine and there is no network, so every
dataset class supports ``fixture=True``: a deterministic, seeded
in-memory mini-dataset with learnable structure (class-dependent shapes,
class-dependent part layouts, scenes with boxes at the positions of
synthetic "objects") so tiny training runs show decreasing loss and
nonzero accuracy. ``write_*`` helpers materialize the same fixtures in
the real on-disk formats to exercise the file loaders.
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np


def _unit_shape(rng: np.random.Generator, cls: int, n: int) -> np.ndarray:
    """A learnable class-conditioned point shape in the unit sphere."""
    kind = cls % 4
    if kind == 0:        # sphere shell, radius varies with class
        r = 0.4 + 0.55 * ((cls // 4) % 5) / 5.0
        v = rng.normal(size=(n, 3))
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-6)
        return (v * r).astype(np.float32)
    if kind == 1:        # cube surface, size varies
        s = 0.3 + 0.6 * ((cls // 4) % 5) / 5.0
        p = rng.uniform(-s, s, size=(n, 3)).astype(np.float32)
        ax = rng.integers(0, 3, n)
        sign = rng.choice([-1.0, 1.0], n)
        p[np.arange(n), ax] = s * sign
        return p
    if kind == 2:        # cylinder, aspect varies
        h = 0.3 + 0.6 * ((cls // 4) % 5) / 5.0
        theta = rng.uniform(0, 2 * np.pi, n)
        z = rng.uniform(-h, h, n)
        return np.stack([0.5 * np.cos(theta), 0.5 * np.sin(theta), z],
                        -1).astype(np.float32)
    # two clusters, separation varies
    d = 0.3 + 0.5 * ((cls // 4) % 5) / 5.0
    c = rng.choice([-d, d], n)
    return (rng.normal(scale=0.15, size=(n, 3)).astype(np.float32)
            + np.stack([c, np.zeros(n), np.zeros(n)], -1).astype(np.float32))


def make_cls_cloud(seed: int, cls: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed * 1009 + cls)
    return _unit_shape(rng, cls, n)


def make_partseg_cloud(
    seed: int, category: int, n: int, num_parts_per_cat: int = 3,
) -> Tuple[np.ndarray, np.ndarray]:
    """Cloud + per-point part labels: parts are spatial slabs along an
    axis that depends on the category (learnable from geometry)."""
    rng = np.random.default_rng(seed * 2003 + category)
    pts = _unit_shape(rng, category, n)
    axis = category % 3
    edges = np.quantile(pts[:, axis], [1 / 3, 2 / 3])
    part = np.digitize(pts[:, axis], edges)
    labels = category * num_parts_per_cat + part
    return pts, labels.astype(np.int32)


def make_detection_scene(
    seed: int,
    *,
    num_objects: int = 5,
    num_bg_points: int = 6000,
    points_per_object: int = 200,
    pc_range=(0.0, -39.68, -3.0, 69.12, 39.68, 1.0),
    num_classes: int = 1,
) -> Dict[str, np.ndarray]:
    """A lidar-like scene: ground-plane clutter + box-shaped clusters.

    Boxes are car-sized with yaw; points inside each box are dense, so a
    detector can learn localization from geometry alone.
    """
    rng = np.random.default_rng(seed)
    # Background: rough ground plane with distance falloff.
    r = rng.exponential(20.0, num_bg_points).clip(2, 68)
    theta = rng.uniform(-0.45 * np.pi, 0.45 * np.pi, num_bg_points)
    bx = r * np.cos(theta)
    by = r * np.sin(theta)
    bz = rng.normal(-1.6, 0.08, num_bg_points)
    bg = np.stack([bx, by, bz, rng.uniform(0, 0.3, num_bg_points)], -1)

    boxes, classes, obj_pts = [], [], []
    for i in range(num_objects):
        cls = int(rng.integers(0, num_classes))
        l, w, h = [(3.9, 1.6, 1.56), (0.8, 0.6, 1.73), (1.76, 0.6, 1.73)][
            cls % 3]
        cx = rng.uniform(5, 60)
        cy = rng.uniform(-30, 30)
        cz = -1.6 + h / 2
        yaw = rng.uniform(-np.pi, np.pi)
        local = np.stack([
            rng.uniform(-l / 2, l / 2, points_per_object),
            rng.uniform(-w / 2, w / 2, points_per_object),
            rng.uniform(-h / 2, h / 2, points_per_object)], -1)
        # Heading cue: real vehicles are front/back asymmetric (low
        # hood, high cabin). Cap the height of front-quarter points so
        # heading is learnable — a uniform box is 180-degree symmetric
        # and pins the direction classifier's CE at ln 2 forever.
        front = local[:, 0] > l / 4
        local[:, 2] = np.where(
            front, np.minimum(local[:, 2], -0.1 * h), local[:, 2])
        c, s = np.cos(yaw), np.sin(yaw)
        world = np.stack([
            cx + local[:, 0] * c - local[:, 1] * s,
            cy + local[:, 0] * s + local[:, 1] * c,
            cz + local[:, 2]], -1)
        inten = rng.uniform(0.4, 1.0, (points_per_object, 1))
        obj_pts.append(np.concatenate([world, inten], -1))
        boxes.append([cx, cy, cz, l, w, h, yaw])
        classes.append(cls)

    points = np.concatenate([bg] + obj_pts).astype(np.float32)
    rng.shuffle(points)
    # Keep only in-range points.
    m = ((points[:, 0] >= pc_range[0]) & (points[:, 0] < pc_range[3])
         & (points[:, 1] >= pc_range[1]) & (points[:, 1] < pc_range[4])
         & (points[:, 2] >= pc_range[2]) & (points[:, 2] < pc_range[5]))
    return {
        "points": points[m],
        "gt_boxes": np.asarray(boxes, np.float32),
        "gt_classes": np.asarray(classes, np.int32),
    }


def make_semantic_scene(
    seed: int, *, num_points: int = 16000, num_classes: int = 20,
) -> Dict[str, np.ndarray]:
    """SemanticKITTI-like scene with geometry-correlated labels.

    Label depends on height band + radial distance band, so a range-image
    segmenter can learn it.
    """
    rng = np.random.default_rng(seed)
    r = rng.exponential(18.0, num_points).clip(2.5, 75)
    theta = rng.uniform(-np.pi, np.pi, num_points)
    x = r * np.cos(theta)
    y = r * np.sin(theta)
    band = rng.integers(0, 3, num_points)
    z = np.where(band == 0, rng.normal(-1.6, 0.05, num_points),
                 np.where(band == 1, rng.uniform(-1.2, 0.5, num_points),
                          rng.uniform(0.5, 2.5, num_points)))
    pts = np.stack([x, y, z, rng.uniform(0, 1, num_points)], -1).astype(
        np.float32)
    rband = np.digitize(r, [10, 30]).astype(np.int64)
    labels = (band * 3 + rband) % num_classes
    return {"points": pts, "point_labels": labels.astype(np.int32)}


# ---------------------------------------------------------------------------
# On-disk materialization in the REAL formats (loader tests).


def write_kitti_fixture(root: str, num_frames: int = 3, seed: int = 0) -> None:
    """Write velodyne/.bin + calib + label_2 in the KITTI layout."""
    os.makedirs(os.path.join(root, "training", "velodyne"), exist_ok=True)
    os.makedirs(os.path.join(root, "training", "calib"), exist_ok=True)
    os.makedirs(os.path.join(root, "training", "label_2"), exist_ok=True)
    # Identity-ish calibration: camera frame = lidar rotated (x=-y', z=x').
    P2 = np.array([[700.0, 0, 600, 45], [0, 700, 180, -0.3],
                   [0, 0, 1, 0.005]])
    R0 = np.eye(3)
    # lidar (x fwd, y left, z up) -> cam (x right, y down, z fwd)
    Tr = np.array([[0.0, -1, 0, 0], [0, 0, -1, -0.08], [1, 0, 0, -0.27]])
    ids = []
    for i in range(num_frames):
        scene = make_detection_scene(seed + i)
        fid = f"{i:06d}"
        ids.append(fid)
        scene["points"].astype(np.float32).tofile(
            os.path.join(root, "training", "velodyne", fid + ".bin"))
        with open(os.path.join(root, "training", "calib", fid + ".txt"),
                  "w") as f:
            f.write("P0: " + " ".join("%g" % v for v in P2.ravel()) + "\n")
            f.write("P1: " + " ".join("%g" % v for v in P2.ravel()) + "\n")
            f.write("P2: " + " ".join("%g" % v for v in P2.ravel()) + "\n")
            f.write("P3: " + " ".join("%g" % v for v in P2.ravel()) + "\n")
            f.write("R0_rect: " + " ".join("%g" % v for v in R0.ravel())
                    + "\n")
            f.write("Tr_velo_to_cam: "
                    + " ".join("%g" % v for v in Tr.ravel()) + "\n")
        with open(os.path.join(root, "training", "label_2", fid + ".txt"),
                  "w") as f:
            for box, cls in zip(scene["gt_boxes"], scene["gt_classes"]):
                x, y, z, l, w, h, yaw = box
                # lidar -> camera coords for the label file.
                cam = Tr @ np.array([x, y, z, 1.0])
                cam_bottom = cam + np.array([0, h / 2, 0])
                ry = -yaw - np.pi / 2
                name = ["Car", "Pedestrian", "Cyclist"][int(cls) % 3]
                f.write(
                    f"{name} 0.00 0 0.0 0 0 50 50 "
                    f"{h:.2f} {w:.2f} {l:.2f} "
                    f"{cam_bottom[0]:.2f} {cam_bottom[1]:.2f} "
                    f"{cam_bottom[2]:.2f} {ry:.2f}\n")
    with open(os.path.join(root, "train.txt"), "w") as f:
        f.write("\n".join(ids) + "\n")


def write_semantickitti_fixture(root: str, num_scans: int = 2,
                                seed: int = 0) -> None:
    """Write sequences/00/velodyne/*.bin + labels/*.label layout."""
    seq = os.path.join(root, "sequences", "00")
    os.makedirs(os.path.join(seq, "velodyne"), exist_ok=True)
    os.makedirs(os.path.join(seq, "labels"), exist_ok=True)
    for i in range(num_scans):
        scene = make_semantic_scene(seed + i)
        sid = f"{i:06d}"
        scene["points"].astype(np.float32).tofile(
            os.path.join(seq, "velodyne", sid + ".bin"))
        # semantic in lower 16 bits, instance id in upper 16.
        lab = (scene["point_labels"].astype(np.uint32)
               | (np.uint32(7) << 16))
        lab.tofile(os.path.join(seq, "labels", sid + ".label"))


def write_modelnet_fixture(root: str, num_per_class: int = 2,
                           num_classes: int = 4, seed: int = 0) -> None:
    """Write the modelnet40_normal_resampled-style txt layout."""
    names = [f"class{c:02d}" for c in range(num_classes)]
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "shape_names.txt"), "w") as f:
        f.write("\n".join(names) + "\n")
    train_ids = []
    for c, name in enumerate(names):
        os.makedirs(os.path.join(root, name), exist_ok=True)
        for k in range(num_per_class):
            pts = make_cls_cloud(seed * 131 + k, c, 256)
            normals = np.zeros_like(pts)
            arr = np.concatenate([pts, normals], -1)
            sid = f"{name}_{k:04d}"
            np.savetxt(os.path.join(root, name, sid + ".txt"), arr,
                       delimiter=",", fmt="%.6f")
            train_ids.append(sid)
    with open(os.path.join(root, "modelnet_train.txt"), "w") as f:
        f.write("\n".join(train_ids) + "\n")

"""A1 — public Python API (SURVEY.md §2.5).

Contract (BASELINE.json:5): ``load_cloud -> preprocess -> infer ->
(boxes, labels)``. ``preprocess`` pads to the config budgets on host;
``infer`` runs ONE jitted device program (voxelize -> encode -> backbone
-> head -> decode -> NMS) so each cloud makes exactly one host<->device
round trip.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Tuple

import numpy as np

from lisec_tpu.config import Config


def load_cloud(path: str) -> np.ndarray:
    """Load a point cloud from disk into an (N, C) float32 array.

    Supported formats: ``.bin`` (KITTI velodyne, N x 4 float32), ``.npy``,
    ``.npz`` (first array), ``.txt``/``.pts`` (whitespace separated).
    """
    ext = os.path.splitext(path)[1].lower()
    if ext == ".bin":
        raw = np.fromfile(path, dtype=np.float32)
        if raw.size % 4:
            raise ValueError(
                f"{path!r}: KITTI .bin must hold N x 4 float32 values, "
                f"got {raw.size} floats (not divisible by 4)")
        return raw.reshape(-1, 4)
    if ext == ".npy":
        return np.load(path).astype(np.float32)
    if ext == ".npz":
        data = np.load(path)
        return data[list(data.keys())[0]].astype(np.float32)
    if ext in (".txt", ".pts", ".xyz"):
        return np.loadtxt(path, dtype=np.float32)
    raise ValueError(f"unsupported cloud format: {path!r}")


def preprocess(cloud: np.ndarray, cfg: Config) -> Dict[str, np.ndarray]:
    """Pad one cloud to the config budgets (host-side, numpy).

    Returns a dict with 'points' (max_points, C) and 'point_mask'
    (max_points,). Device-side preprocessing (voxelization etc.) happens
    inside the jitted pipeline, not here.
    """
    from lisec_tpu.data.collate import pad_points
    return pad_points(cloud, cfg.budget.max_points)


def build_model(cfg: Config):
    """Build the pipeline object for a config (registry lookup)."""
    from lisec_tpu import models  # noqa: F401 — populate registries
    from lisec_tpu.registry import get_pipeline
    return get_pipeline(cfg.model.name)(cfg)


def infer(pipeline, state, batch) -> Tuple[Any, Any]:
    """Run the jitted inference program; returns the pipeline's outputs
    (boxes/labels for detection, labels for cls/seg)."""
    return pipeline.infer(state, batch)


def train(cfg: Config, **kwargs):
    from lisec_tpu.training.loop import run_training
    return run_training(cfg, **kwargs)


def evaluate(cfg: Config, **kwargs):
    from lisec_tpu.training.loop import run_evaluation
    return run_evaluation(cfg, **kwargs)

"""B1 — benchmark harness (SURVEY.md §2.5 B1).

Measures the driver metrics (BASELINE.json:2) on the local chip:
  * clouds/sec/chip — end-to-end PointPillars-style inference
    (host->device transfer, voxelize, network, decode, NMS,
    device->host boxes), steady state, batch amortized;
  * voxelization GB/s — bytes of point data binned per second (O1).

North star: >= 10k KITTI clouds/sec/chip on v5e (BASELINE.json:5);
``vs_baseline`` reports the ratio against that target.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import numpy as np

from lisec_tpu.config import Config

NORTH_STAR_CLOUDS_PER_SEC = 10_000.0


def _fixture_batch(cfg: Config, batch_size: int, seed: int = 0):
    from lisec_tpu.data.collate import make_batches
    from lisec_tpu.data.kitti import KittiDetection

    ds = KittiDetection(cfg, "train")
    return next(make_batches(ds, cfg.budget, batch_size, shuffle=False,
                             seed=seed))


def bench_inference(cfg: Config, *, batch_size: int = 8,
                    warmup: int = 3, iters: int = 20) -> Dict[str, float]:
    """End-to-end inference throughput on the current default device."""
    from lisec_tpu.api import build_model

    pipeline = build_model(cfg)
    state = pipeline.init_state(cfg.train.seed)
    batch = _fixture_batch(cfg, batch_size)
    infer_batch = {"points": batch["points"],
                   "point_mask": batch["point_mask"]}

    for _ in range(warmup):
        out = pipeline.infer(state, infer_batch)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        # Includes host->device transfer each iteration: the metric is
        # end-to-end per cloud, not device-only.
        out = pipeline.infer(state, infer_batch)
        np.asarray(out["boxes"])          # device->host sync
    dt = time.perf_counter() - t0
    clouds_per_sec = batch_size * iters / dt
    return {
        "clouds_per_sec": clouds_per_sec,
        "latency_ms_per_batch": 1e3 * dt / iters,
        "batch_size": batch_size,
    }


def bench_voxelize(cfg: Config, *, batch_size: int = 8,
                   warmup: int = 3, iters: int = 30) -> Dict[str, float]:
    """Voxelization throughput in GB/s of point bytes processed."""
    import jax.numpy as jnp
    from lisec_tpu.ops.voxelize import voxelize

    batch = _fixture_batch(cfg, batch_size)
    points = jnp.asarray(batch["points"])
    mask = jnp.asarray(batch["point_mask"])

    vox_fn = jax.jit(jax.vmap(lambda p, m: voxelize(
        p, m,
        pc_range=cfg.voxel.point_cloud_range,
        voxel_size=cfg.voxel.voxel_size,
        grid_size=cfg.voxel.grid_size,
        max_voxels=cfg.budget.max_voxels,
        max_points_per_voxel=cfg.budget.max_points_per_voxel)))

    for _ in range(warmup):
        out = vox_fn(points, mask)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = vox_fn(points, mask)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    nbytes = points.size * points.dtype.itemsize
    return {
        "voxelize_gb_per_sec": nbytes * iters / dt / 1e9,
        "voxelize_us_per_cloud": 1e6 * dt / (iters * batch_size),
    }


def run_benchmark(cfg: Config, *, batch_size: int = 8) -> Dict:
    inf = bench_inference(cfg, batch_size=batch_size)
    vox = bench_voxelize(cfg, batch_size=batch_size)
    value = inf["clouds_per_sec"]
    return {
        "metric": "kitti_clouds_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "clouds/s",
        "vs_baseline": round(value / NORTH_STAR_CLOUDS_PER_SEC, 4),
        "detail": {**inf, **vox,
                   "device": str(jax.devices()[0]).strip()},
    }

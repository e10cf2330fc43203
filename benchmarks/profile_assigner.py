"""Same-session A/B of the target assigners (r3 verdict #3).

Compares, chain-timed back-to-back in ONE session (cross-session drift
on this box is 15-25%):
  * vmapped per-frame windowed assigner (scatter-based reductions)
  * batched windowed assigner (sort + paint reductions)
plus stage splits of the batched one: window IoU alone, sort alone.

Run: python benchmarks/profile_assigner.py [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.profile_flagship import chain_timer, measure_sync_floor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from lisec_tpu.config import apply_overrides, load_config
    from lisec_tpu.api import build_model
    from lisec_tpu.bench_lib import _fixture_batch
    from lisec_tpu.training.assigner import (
        assign_targets_windowed, assign_targets_windowed_batched)

    cfg = load_config("configs/pointpillars_kitti.yaml")
    cfg = apply_overrides(cfg, [
        "data.fixture=true", "data.fixture_size=8",
        "data.augment.enabled=false", "train.ckpt_dir=",
        f"train.batch_size={args.batch}",
    ])
    pipeline = build_model(cfg)
    batch = _fixture_batch(cfg, args.batch)
    gtb = jnp.asarray(batch["gt_boxes"])
    gtc = jnp.asarray(batch["gt_classes"])
    gtm = jnp.asarray(batch["gt_mask"])
    pc = tuple(cfg.voxel.point_cloud_range)
    w = pipeline.assign_window
    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms")
    B, it = args.batch, args.iters

    def rec(name, fn, fargs):
        dt = chain_timer(fn, fargs, it, floor)
        print(f"{name:>22}: {1e3 * dt:8.3f} ms/batch-{B}")
        return dt

    def vmapped(gtb, gtc, gtm):
        out = jax.vmap(lambda b, c, m: assign_targets_windowed(
            pipeline.anchors, pipeline.anchor_classes,
            pipeline.pos_thr, pipeline.neg_thr,
            pipeline.class_sizes, pipeline.class_z, b, c, m,
            feature_map_size=pipeline.fmap, pc_range=pc,
            window=w))(gtb, gtc, gtm)
        return (jnp.sum(out.reg_targets) + jnp.sum(out.cls_targets)
                + jnp.sum(out.positive))

    def batched(gtb, gtc, gtm):
        out = assign_targets_windowed_batched(
            pipeline.anchors, pipeline.anchor_classes,
            pipeline.pos_thr, pipeline.neg_thr,
            pipeline.class_sizes, pipeline.class_z, gtb, gtc, gtm,
            feature_map_size=pc and pipeline.fmap, pc_range=pc,
            window=w)
        return (jnp.sum(out.reg_targets) + jnp.sum(out.cls_targets)
                + jnp.sum(out.positive))

    rec("windowed (vmap+scatter)", vmapped, (gtb, gtc, gtm))
    rec("batched (sort+paint)", batched, (gtb, gtc, gtm))

    # Stage splits of the batched form.
    from lisec_tpu.ops.rotated_iou import rotated_iou_bev
    from lisec_tpu.training.assigner import ROTATIONS

    ny, nx = pipeline.fmap
    ncls = pipeline.class_sizes.shape[0]
    nrot = len(ROTATIONS)
    m = gtb.shape[1]
    k = w * w * ncls * nrot

    def iou_only(gtb, gtc, gtm):
        b = gtb.shape[0]
        step_x = (pc[3] - pc[0]) / nx
        step_y = (pc[4] - pc[1]) / ny
        gx0 = jnp.clip(jnp.round(
            (gtb[..., 0] - pc[0]) / step_x - 0.5).astype(jnp.int32)
            - w // 2, 0, nx - w)
        gy0 = jnp.clip(jnp.round(
            (gtb[..., 1] - pc[1]) / step_y - 0.5).astype(jnp.int32)
            - w // 2, 0, ny - w)
        dd = jnp.arange(w, dtype=jnp.int32)
        ix = gx0[..., None] + dd
        iy = gy0[..., None] + dd
        shape = (b, m, w, w, ncls, nrot)
        ax = pc[0] + (ix.astype(jnp.float32) + 0.5) * step_x
        ay = pc[1] + (iy.astype(jnp.float32) + 0.5) * step_y
        ax_b = jnp.broadcast_to(ax[:, :, None, :, None, None], shape)
        ay_b = jnp.broadcast_to(ay[:, :, :, None, None, None], shape)
        az = jnp.broadcast_to(
            pipeline.class_z[None, None, None, None, :, None], shape)
        asz = jnp.broadcast_to(
            pipeline.class_sizes[None, None, None, None, :, None, :],
            shape + (3,))
        rot = jnp.asarray(ROTATIONS, jnp.float32)
        arot = jnp.broadcast_to(
            rot[None, None, None, None, None, :], shape)
        wa = jnp.concatenate(
            [jnp.stack([ax_b, ay_b, az], -1), asz, arot[..., None]], -1)
        gt_flat = jnp.broadcast_to(
            gtb[:, :, None, :], (b, m, k, 7)).reshape(b * m * k, 7)
        return jnp.sum(rotated_iou_bev(wa.reshape(b * m * k, 7), gt_flat))
    rec("window IoU only", iou_only, (gtb, gtc, gtm))

    def sort_only(x):
        a = (x * 1e6).astype(jnp.int32)
        s = jax.lax.sort(
            (a, -x, jnp.broadcast_to(
                jnp.arange(x.shape[1], dtype=jnp.int32)[None], x.shape)),
            dimension=1, num_keys=3)
        return jnp.sum(s[1])
    xs = jax.random.uniform(jax.random.PRNGKey(0),
                            (args.batch, m * k), jnp.float32)
    rec(f"3-key sort ({m * k} rows)", sort_only, (xs,))


if __name__ == "__main__":
    main()

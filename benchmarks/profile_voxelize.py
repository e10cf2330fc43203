"""Voxelize cost attribution (r3 verdict #10): the op runs ~10x above
its co-sort floor (0.825 GB/s, 635 us/cloud) and no profile ever split
it. Stages, chain-timed in one session: full op, the co-sort alone,
rank scans (cumsum + associative running-max), record pack (the
one-hot slot outer product), the slot-packed 128-lane paint, and the
inverse 2-op sort.

Run: python benchmarks/profile_voxelize.py [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")

import jax
import jax.numpy as jnp

from lisec_tpu.bench_lib import chain_time, measure_sync_floor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from lisec_tpu.config import apply_overrides, load_config
    from lisec_tpu.bench_lib import _fixture_batch
    from lisec_tpu.ops.voxelize import point_cell_ids, voxelize_batch
    from lisec_tpu.ops.pallas.pillar_paint import segment_paint

    cfg = load_config("configs/pointpillars_kitti.yaml")
    cfg = apply_overrides(cfg, [
        "data.fixture=true", "data.fixture_size=8",
        "data.augment.enabled=false", "train.ckpt_dir=",
    ])
    batch = _fixture_batch(cfg, args.batch)
    pts = jnp.asarray(batch["points"])
    mask = jnp.asarray(batch["point_mask"])
    B = args.batch
    kw = dict(pc_range=tuple(cfg.voxel.point_cloud_range),
              voxel_size=tuple(cfg.voxel.voxel_size),
              grid_size=tuple(cfg.voxel.grid_size),
              max_voxels=cfg.budget.max_voxels,
              max_points_per_voxel=cfg.budget.max_points_per_voxel)
    b, n, c = pts.shape
    kk = kw["max_points_per_voxel"]
    num_cells = kw["grid_size"][0] * kw["grid_size"][1] * kw["grid_size"][2]
    rw = 8 if c + 4 <= 8 else 16
    spr = 128 // rw
    total_slots = kw["max_voxels"] * kk
    num_rows = -(-total_slots // spr)

    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms  "
          f"(N={n} K={kk} P={kw['max_voxels']} rw={rw})")
    results = {}

    def rec(name, fn, fargs):
        dt = chain_time(fn, fargs, args.iters, floor)
        results[name] = round(1e3 * dt, 3)
        print(f"{name:>14}: {1e3 * dt:8.3f} ms/batch-{B}")

    def full(p, m):
        return jnp.sum(voxelize_batch(p, m, **kw).voxels)
    rec("full_voxelize", full, (pts, mask))

    def sort_only(p, m):
        cell, _ = point_cell_ids(p, m, kw["pc_range"], kw["voxel_size"],
                                 kw["grid_size"])
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None],
                               (b, n))
        s = jax.lax.sort((cell, idx) + tuple(p[..., j] for j in range(c)),
                         dimension=1, num_keys=2)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in s)
    rec("co-sort", sort_only, (pts, mask))

    # rank scans on a pre-sorted stream
    cell0, _ = point_cell_ids(pts, mask, kw["pc_range"],
                              kw["voxel_size"], kw["grid_size"])
    cell_s = jnp.sort(cell0, axis=1)

    def scans(cs):
        cs = cs.astype(jnp.int32)
        prev = jnp.concatenate(
            [jnp.full((b, 1), -1, cs.dtype), cs[:, :-1]], axis=1)
        is_start = (cs != prev) & (cs < num_cells)
        rank = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
        pos = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None],
                               (b, n))
        seg_start = jax.lax.associative_scan(
            jnp.maximum, jnp.where(is_start, pos, 0), axis=1)
        return jnp.sum(rank) + jnp.sum(pos - seg_start)
    rec("rank scans", scans, (cell_s.astype(jnp.float32),))

    # record pack (one-hot outer product) on synthetic slots
    slot = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))

    def pack(p):
        recs = jnp.concatenate(
            [p.astype(jnp.float32),
             jnp.ones((b, n, 4), jnp.float32),
             jnp.zeros((b, n, rw - c - 4), jnp.float32)], axis=-1)
        sub = jax.nn.one_hot(slot % spr, spr, dtype=jnp.float32)
        packed = (sub[..., :, None] * recs[..., None, :]).reshape(
            b, n, 128)
        return jnp.sum(packed)
    rec("record pack", pack, (pts,))

    # the slot-packed paint alone (pre-packed rows)
    packed0 = jnp.zeros((b, n, 128), jnp.float32).at[..., 7].set(1.0)
    row0 = jnp.minimum(slot // spr, num_rows - 1)

    def paint(pk):
        return jnp.sum(segment_paint(
            pk, row0, num_cells=num_rows, num_max=0, count_channel=127,
            slab=2048, window=512))
    rec("slot paint", paint, (packed0,))

    def inv_sort(p):
        idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None],
                               (b, n))
        s = jax.lax.sort((idx, jnp.round(p[..., 0]).astype(jnp.int32)),
                         dimension=1, num_keys=1)
        return jnp.sum(s[1].astype(jnp.float32))
    rec("inverse sort", inv_sort, (pts,))

    print(json.dumps(results))


if __name__ == "__main__":
    main()

"""Cost attribution INSIDE the fused pillar-encoder kernel.

profile_flagship.py puts the encoder at ~10 ms/batch-8 with only
~0.9 ms of XLA glue — the rest is in-kernel. This times the kernel
with pieces ablated (encoder_kernel.py `ablate` switch) to attribute
the in-kernel cost between the segment-geometry scan, the u/st
segmented scans, the one-hot routing matmul, and the epilogue.

Each variant is its own Mosaic compile (~1.5 min on this backend), so
the list is short. Run:
    python benchmarks/profile_encoder_kernel.py [--iters 20] [--batch 8]
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
import numpy as np

from lisec_tpu.bench_lib import chain_time, measure_sync_floor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--slab", type=int, default=2048)
    ap.add_argument("--window", type=int, default=256)
    args = ap.parse_args()

    from lisec_tpu.config import apply_overrides, load_config
    from lisec_tpu.bench_lib import _fixture_batch
    from lisec_tpu.ops.pallas.encoder_kernel import pillar_canvas_fused

    cfg = load_config("configs/pointpillars_kitti.yaml")
    cfg = apply_overrides(cfg, [
        "data.fixture=true", "data.fixture_size=8",
        "data.augment.enabled=false", "train.ckpt_dir=",
    ])
    batch = _fixture_batch(cfg, args.batch)
    points = jnp.asarray(batch["points"])
    mask = jnp.asarray(batch["point_mask"])
    c = 64
    w = jnp.asarray(np.random.RandomState(0).randn(9, c), jnp.float32)
    t = jnp.zeros((c,), jnp.float32)
    kw = dict(
        grid=(cfg.voxel.grid_size[0], cfg.voxel.grid_size[1]),
        voxel_size=tuple(cfg.voxel.voxel_size[:2]),
        pc_range=tuple(cfg.voxel.point_cloud_range),
        slab=args.slab, window=args.window)

    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms  "
          f"(slab={args.slab} window={args.window})")
    results = {}
    variants = [
        ("full", ""),
        ("no_route", "route"),          # scans live, routing gone
        ("no_scan", "scan"),            # routing on unscanned values
        ("no_scan_no_route", "scan route"),
        ("no_segid_scan_route", "segid scan route"),  # DMA+mask floor
        ("no_epi", "epi"),
    ]
    for name, ab in variants:
        fn = lambda p, m, _ab=ab: jnp.sum(
            pillar_canvas_fused(p, m, w, t, ablate=_ab, **kw)
            .astype(jnp.float32))
        dt = chain_time(fn, (points, mask), args.iters, floor)
        results[name] = 1e3 * dt
        print(f"{name:>22}: {1e3 * dt:8.3f} ms/batch-{args.batch}")

    full = results["full"]
    print("--- attribution (ms, batch-%d) ---" % args.batch)
    print(f"  routing matmul+build: {full - results['no_route']:6.3f}")
    print(f"  u/st segmented scans: {full - results['no_scan']:6.3f}")
    print(f"  epilogue:             {full - results['no_epi']:6.3f}")
    print(f"  DMA+mask floor:       {results['no_segid_scan_route']:6.3f}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

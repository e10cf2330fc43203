"""(slab, window) sweep of the fused encoder kernel (r3 verdict #8).

The kernel's per-program fixed costs (acc zeroing, epilogue matmul,
out-block DMA setup) scale with program count = B * ceil(cells/slab),
while the routing-matmul total is slab-invariant (windows shrink as
slabs grow). Round 3 ran slab=2048 (840 programs at batch 8); this
sweeps slab/window to find the floor. Each combo is its own Mosaic
compile (~1.5 min uncached).

Run: python benchmarks/profile_encoder_sweep.py [--batch 8]
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

from lisec_tpu.bench_lib import chain_time, measure_sync_floor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=8)
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
    base = dict(
        grid=(cfg.voxel.grid_size[0], cfg.voxel.grid_size[1]),
        voxel_size=tuple(cfg.voxel.voxel_size[:2]),
        pc_range=tuple(cfg.voxel.point_cloud_range))

    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms")
    ncells = base["grid"][0] * base["grid"][1]
    for slab in (2048, 4096, 8192):
        for window in (256, 512):
            fn = lambda p, m, _s=slab, _w=window: jnp.sum(
                pillar_canvas_fused(p, m, w, t, slab=_s, window=_w,
                                    **base).astype(jnp.float32))
            dt = chain_time(fn, (points, mask), args.iters, floor)
            progs = args.batch * (-(-ncells // slab))
            print(f"slab={slab:5d} window={window:4d} "
                  f"({progs:4d} programs): {1e3 * dt:7.3f} "
                  f"ms/batch-{args.batch}")


if __name__ == "__main__":
    main()

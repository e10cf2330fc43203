"""Measure per-level active voxel counts for SECOND (r3 verdict #6).

The sparse encoder's rulebook sorts and spread kernels all run at
PADDED static budgets (level_budgets / max_voxels) regardless of how
many voxels are actually active — the TPU static-shape tax. A
dynamic-shape implementation (the reference class) only ever pays for
the voxels that exist. This prints the actual per-level active-count
distribution over the fixture scenes so the budgets can be bounded to
the data's p95+margin instead of the worst-case config — the honest
static-shape equivalent of dynamic shapes (overflow beyond the budget
drops voxels; tests/test_budget_ablation.py tracks the AP effect).

Run: python benchmarks/profile_second_budgets.py [--scenes 16]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    from lisec_tpu.api import build_model
    from lisec_tpu.config import apply_overrides, load_config
    from lisec_tpu.data.collate import make_batches
    from lisec_tpu.data.kitti import KittiDetection
    from lisec_tpu.ops.sparse_conv import (
        SparseConvSpec, build_output_coords)

    cfg = load_config("configs/second_kitti.yaml")
    cfg = apply_overrides(cfg, [
        "data.fixture=true", f"data.fixture_size={args.scenes}",
        "data.augment.enabled=true", "train.ckpt_dir=",
        f"train.batch_size={args.batch}",
    ])
    pipeline = build_model(cfg)
    ds = KittiDetection(cfg, "train")

    nx, ny, nz = cfg.voxel.grid_size
    grid = (nz, ny, nx)
    budgets = [int(b) for b in cfg.model.params["level_budgets"]]

    def down_spec(g):
        return SparseConvSpec((3, 3, 3), (2, 2, 2), (1, 1, 1), g)

    # Measure with a 64k cap (4x the largest budget) so the TRUE active
    # count is visible — the config budgets saturate at levels 1-3
    # because the stride-2 3^3 downsample DILATES a sparse active set.
    cap = 65536

    @jax.jit
    def level_counts(points, mask):
        vox = pipeline._voxelize_batch(points, mask)
        coords, num = vox.coords, vox.num_voxels
        counts = [num]
        g = grid
        for level in range(3):
            spec = down_spec(g)
            coords, num = jax.vmap(
                lambda c, n, _s=spec: build_output_coords(
                    c, n, _s, max_out=cap))(coords, num)
            counts.append(num)
            g = spec.grid_out
        return jnp.stack(counts)          # (4, B)

    per_level = [[] for _ in range(4)]
    for i, batch in enumerate(make_batches(
            ds, cfg.budget, args.batch, shuffle=True, seed=0)):
        c = np.asarray(level_counts(
            jnp.asarray(batch["points"]), jnp.asarray(batch["point_mask"])))
        for lv in range(4):
            per_level[lv].extend(c[lv].tolist())
        if (i + 1) * args.batch >= args.scenes * 2:
            break

    print(f"budgets (config): max_voxels={cfg.budget.max_voxels} "
          f"level_budgets={budgets}")
    for lv in range(4):
        a = np.asarray(per_level[lv])
        print(f"level {lv}: n={len(a)} mean={a.mean():8.0f} "
              f"p50={np.percentile(a, 50):8.0f} "
              f"p95={np.percentile(a, 95):8.0f} max={a.max():8.0f} "
              f"(budget {budgets[lv] if lv else cfg.budget.max_voxels})")


if __name__ == "__main__":
    main()

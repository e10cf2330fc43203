"""Per-stage profile of the SECOND inference program (round 3: the
workload sits at 16.4 clouds/s batch-4 and the K-reduction spread
kernel alone measures ~3.6 ms — attribute the remaining ~230 ms).

Run:  python benchmarks/profile_second.py [--iters 10] [--batch 4]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--config", default="configs/second_kitti.yaml")
    args = ap.parse_args()

    from lisec_tpu.config import apply_overrides, load_config
    from lisec_tpu.api import build_model
    from lisec_tpu.data.collate import make_batches
    from lisec_tpu.models.second import mean_vfe
    from lisec_tpu.ops.sparse_conv import (
        SparseConvSpec, build_output_coords, build_scatter_rulebook)

    cfg = load_config(args.config)
    cfg = apply_overrides(cfg, [
        "data.fixture=true", "data.fixture_size=8",
        "data.augment.enabled=false", "train.ckpt_dir=",
        f"train.batch_size={args.batch}",
    ])
    pipeline = build_model(cfg)
    state = pipeline.init_state(0)
    ds = pipeline.make_dataset("train")
    batch_np = next(make_batches(ds, cfg.budget, args.batch,
                                 shuffle=False))
    jb = {k: jnp.asarray(v) for k, v in batch_np.items()}
    B = args.batch
    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms")
    results = {}

    def rec(name, fn, fargs):
        dt = chain_time(fn, fargs, args.iters, floor)
        results[name] = round(1e3 * dt, 3)
        print(f"{name:>24}: {1e3 * dt:8.3f} ms/batch-{B}")

    keys = sorted(jb.keys())

    def full(*a):
        bb = dict(zip(keys, a))
        out = pipeline.predict(state.params, state.batch_stats, bb)
        return jnp.sum(next(iter(out.values())).astype(jnp.float32))
    rec("full_predict", full, tuple(jb[k] for k in keys))

    # Voxelize + mean-VFE (the pipeline's preprocessing)
    def vox(points, pmask):
        v = pipeline._voxelize_batch(points, pmask)
        return jnp.sum(mean_vfe(v.voxels, v.num_points)
                       .astype(jnp.float32))
    if True:
        rec("voxelize+vfe", vox, (jb["points"], jb["point_mask"]))

    # Geometry for the sparse stack: voxelize once, then time the
    # rulebook/coord builders and the conv stack on real coords.
    nx, ny, nz = cfg.voxel.grid_size
    grid = (nz, ny, nx)
    v = pipeline._voxelize_batch(jb["points"], jb["point_mask"])
    coords = v.coords
    num_vox = v.num_voxels
    feats = mean_vfe(v.voxels, v.num_points)

    subm = SparseConvSpec((3, 3, 3), (1, 1, 1), (1, 1, 1), grid)
    down = SparseConvSpec((3, 3, 3), (2, 2, 2), (1, 1, 1), grid)

    def rb(c):
        c = c.astype(jnp.int32)
        out = build_scatter_rulebook(c, num_vox, c, num_vox, subm)
        return jnp.sum(out)
    rec("rulebook_subm_L0", rb, (coords.astype(jnp.float32),))

    from lisec_tpu.ops.sparse_conv import build_subm_scatter_rulebook

    def rbm(c):
        c = c.astype(jnp.int32)
        out = build_subm_scatter_rulebook(c, num_vox, subm)
        return jnp.sum(out)
    rec("rulebook_subm_L0_mirror", rbm, (coords.astype(jnp.float32),))

    def oc(c):
        c = c.astype(jnp.int32)
        o, n = jax.vmap(lambda cc, nn: build_output_coords(
            cc, nn, down, max_out=16000))(c, num_vox)
        return jnp.sum(o) + jnp.sum(n)
    rec("out_coords_L0", oc, (coords.astype(jnp.float32),))

    # The z einsum at L2/L3 geometry (the biggest: C=64)
    x64 = jnp.zeros((B, 16384, 64), jnp.bfloat16)
    w64 = jnp.zeros((27, 64, 64), jnp.bfloat16)

    def ein(x, w):
        z = jnp.einsum("bvc,kcd->bkdv", x, w,
                       preferred_element_type=jnp.float32)
        return jnp.sum(z.astype(jnp.bfloat16).astype(jnp.float32))
    rec("einsum_c64_v16384", ein, (x64, w64))

    # Middle encoder alone (the real module, current config).
    from lisec_tpu.models.second import SparseMiddleEncoder

    p = cfg.model.params
    mdtype = jnp.dtype(p.get("dtype", "float32"))
    enc = SparseMiddleEncoder(
        grid=grid, channels=tuple(p["encoder_channels"]),
        level_budgets=tuple(p["level_budgets"]),
        dense_from_level=int(p.get("dense_from_level", 2)),
        dtype=mdtype)
    evars = enc.init(jax.random.PRNGKey(0), feats.astype(mdtype),
                     v.coords.astype(jnp.int32), num_vox)

    def enc_fn(f, cc, n):
        out = enc.apply(evars, f.astype(mdtype), cc.astype(jnp.int32),
                        n, train=False)
        return jnp.sum(out.astype(jnp.float32))
    rec("middle_encoder", enc_fn,
        (feats.astype(jnp.float32), coords.astype(jnp.float32), num_vox))

    # Network forward (mean-VFE + middle encoder + BEV + head),
    # voxelization excluded.
    def net(vx, cc, npts, nv):
        out = pipeline.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            vx, cc.astype(jnp.int32), npts, nv, train=False)
        return jnp.sum(out["cls"])
    rec("network_fwd", net,
        (v.voxels, coords.astype(jnp.float32), v.num_points, num_vox))

    print(json.dumps(results))


if __name__ == "__main__":
    main()

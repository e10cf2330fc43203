"""Per-stage profile of the PointNet++ part-seg program (VERDICT r2
item 5: 815 clouds/s was never attributed to FPS / ball query /
grouping / MLPs).

Stages are chain-timed at the production partseg geometry
(configs/pointnet2_shapenetpart.yaml: 2048 points, SA levels 512/128
with MSG radii). Run:

    python benchmarks/profile_pointnet2.py [--iters 20] [--batch 16]
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
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    from lisec_tpu.config import apply_overrides, load_config
    from lisec_tpu.api import build_model
    from lisec_tpu.data.collate import make_batches
    from lisec_tpu.ops.fps import farthest_point_sampling
    from lisec_tpu.ops.ball_query import ball_query
    from lisec_tpu.ops.grouping import group_and_decorate
    from lisec_tpu.ops.three_nn import three_nn, three_interpolate

    cfg = load_config("configs/pointnet2_shapenetpart.yaml")
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
    n = jb["points"].shape[1]
    xyz = jb["points"][..., :3]
    mask = jb["point_mask"]

    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms  (N={n})")
    results = {}

    def rec(name, fn, fargs):
        dt = chain_time(fn, fargs, args.iters, floor)
        results[name] = round(1e3 * dt, 3)
        print(f"{name:>22}: {1e3 * dt:8.3f} ms/batch-{B}"
              f"  ({1e6 * dt / B:9.1f} us/cloud)")

    # full predict
    keys = sorted(jb.keys())

    def full(*a):
        bb = dict(zip(keys, a))
        out = pipeline.predict(state.params, state.batch_stats, bb)
        leaf = next(iter(out.values()))
        return jnp.sum(leaf.astype(jnp.float32))
    rec("full_predict", full, tuple(jb[k] for k in keys))

    # FPS at both SA levels
    for m in (512, 128):
        src = n if m == 512 else 512
        x = xyz[:, :src]
        msk = mask[:, :src]
        rec(f"fps_{src}->{m}",
            lambda xx, mm, _m=m: jnp.sum(farthest_point_sampling(
                xx, mm, _m).astype(jnp.float32)),
            (x, msk))

    # Ball query + grouping at level 1 geometry (512 centers, r=.2, K=32)
    new_xyz = xyz[:, :512]
    rec("ball_query_512x32",
        lambda nx, xx: jnp.sum(ball_query(
            nx, xx, mask, radius=0.2, num_neighbors=32).astype(jnp.float32)),
        (new_xyz, xyz))
    nbr = ball_query(new_xyz, xyz, mask, radius=0.2, num_neighbors=32)
    feats = jnp.ones((B, n, 64), jnp.float32)
    rec("group_512x32_c64",
        lambda xx, ff: jnp.sum(group_and_decorate(
            xx, ff, xx[:, :512], nbr).astype(jnp.float32)),
        (xyz, feats))

    # 3-NN feature interpolation (128 -> 512 upsample, C=256)
    f128 = jnp.ones((B, 128, 256), jnp.float32)
    m128 = jnp.ones((B, 128), bool)

    def interp(t, s, ff):
        d2, idx = three_nn(t, s, m128)
        return jnp.sum(three_interpolate(ff, idx, d2)
                       .astype(jnp.float32))
    rec("three_nn_128->512_c256", interp, (new_xyz, xyz[:, :128], f128))

    print(json.dumps(results))


if __name__ == "__main__":
    main()

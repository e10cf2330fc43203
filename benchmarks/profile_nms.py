"""Ablation profile of the flagship's rotated NMS (O11).

The round-5 flagship split (prof_flag32.log) put NMS at 12.57 ms/b32
(393 us/cloud) in the worst-case regime (all 1024 candidates above
threshold), ~20% of full_predict — the largest non-backbone stage. At
k_near=64 the exact-IoU math is only ~2.3 ms of that (328k pairs at
7 ns), so the cost lives in per-round machinery: the masked top_k
block-select, the circle-compaction top_k, the near-table gathers, the
kill scatter. This profiler attributes it by toggling one mechanism at
a time (same candidate geometry as profile_flagship's NMS stage):

  base           current production config (topk select, k_near=64)
  scan_select    cumsum block-select instead of the masked top_k sort
  no_iou         pair IoU replaced by a dot (isolates enumeration math)
  no_compact_srt compaction top_k replaced by fixed indices (isolates
                 the per-round (block, nms_pre) sort; results wrong)
  block32/8      round-count knob (pairs constant, rounds halve/double)
  k_near32/128   near-table width knob
  full           no compaction at all (block x nms_pre IoU rows)
  sparse40       trained-detector score regime (~40 above threshold;
                 measures what the early exit buys a deployed model)

Run: python benchmarks/profile_nms.py [--iters 20] [--batch 32]
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

from lisec_tpu.bench_lib import chain_time, measure_sync_floor  # noqa: E402
from lisec_tpu.ops.nms import rotated_nms  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args()
    B, it = args.batch, args.iters

    rng = jax.random.PRNGKey(0)
    # Same candidate geometry as profile_flagship stage 5: car-sized
    # boxes spread over the KITTI pc_range.
    ctr = jax.random.uniform(
        rng, (B, 1024, 2), jnp.float32,
        minval=jnp.asarray([0.0, -39.68]), maxval=jnp.asarray([69.12, 39.68]))
    dims = jax.random.uniform(rng, (B, 1024, 3), jnp.float32,
                              minval=1.5, maxval=4.5)
    ang = jax.random.uniform(rng, (B, 1024, 1), jnp.float32) * 6.28
    nb = jnp.concatenate([ctr, jnp.zeros((B, 1024, 1)), dims, ang], axis=-1)
    ns = jax.random.uniform(rng, (B, 1024), jnp.float32)
    nl = jnp.zeros((B, 1024), jnp.int32)
    ns_sparse = jnp.where(
        jnp.arange(1024)[None, :] < 40,
        jax.random.uniform(rng, (B, 1024), jnp.float32, minval=0.2,
                           maxval=1.0),
        jax.random.uniform(rng, (B, 1024), jnp.float32, minval=0.0,
                           maxval=0.09))

    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms")
    results = {}

    def run(name, scores, **kw):
        kw.setdefault("iou_threshold", 0.5)
        kw.setdefault("score_threshold", 0.1)
        kw.setdefault("nms_pre", 1024)
        kw.setdefault("nms_post", 128)
        kw.setdefault("k_near", 64)

        def fn(b, s, l):
            out = jax.vmap(lambda bb, ss, ll: rotated_nms(
                bb, ss, ll, **kw))(b, s, l)
            return jnp.sum(out.scores)
        dt = chain_time(fn, (nb, scores, nl), it, floor)
        results[name] = 1e3 * dt
        print(f"{name:>16}: {1e3 * dt:8.3f} ms/batch-{B}"
              f"  ({1e6 * dt / B:8.1f} us/cloud)")

    run("base", ns)
    run("scan_select", ns, select="scan")
    run("no_iou", ns, _ablate="skip_iou")
    run("no_compact_srt", ns, _ablate="fixed_near")
    run("machinery_only", ns, _ablate="skip_iou,fixed_near")
    run("block32", ns, block=32)
    run("block32_scan", ns, block=32, select="scan")
    run("block8", ns, block=8)
    run("k_near32", ns, k_near=32)
    run("k_near128", ns, k_near=128)
    run("full_rows", ns, k_near=0)
    run("sparse40", ns_sparse)
    run("sparse40_scan", ns_sparse, select="scan")

    print(json.dumps(results))
    print("EXIT=0")


if __name__ == "__main__":
    main()

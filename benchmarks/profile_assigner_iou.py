"""Attribute the windowed assigner's IoU stage: pure flat pair IoU vs
window-anchor construction (round-4; the sort+paint reduction rewrite
targeted the reduction but the stage split says the IoU stage is ~85%
of the assigner).

Run: python benchmarks/profile_assigner_iou.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")

import jax
import jax.numpy as jnp

from lisec_tpu.bench_lib import chain_time, measure_sync_floor


def main():
    from lisec_tpu.ops.rotated_iou import rotated_iou_bev

    n = 4 * 64 * 2048          # the batch-4 window pair count (w=32, C1 R2)
    key = jax.random.PRNGKey(0)
    ka, kb = jax.random.split(key)
    boxes_a = jnp.concatenate([
        jax.random.uniform(ka, (n, 2), jnp.float32, -30, 30),
        jnp.full((n, 1), -1.0),
        jnp.tile(jnp.asarray([[3.9, 1.6, 1.56]], jnp.float32), (n, 1)),
        jax.random.uniform(kb, (n, 1), jnp.float32, 0, 3.14)], axis=-1)
    boxes_b = boxes_a[::-1]

    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms  ({n} pairs)")

    def iou_flat(a, b):
        return jnp.sum(rotated_iou_bev(a, b))
    dt = chain_time(iou_flat, (boxes_a, boxes_b), 10, floor)
    print(f"flat pair IoU: {1e3 * dt:8.3f} ms   ({1e9 * dt / n:.1f} ns/pair)")


if __name__ == "__main__":
    main()

"""Micro-profile of the fused pillar encoder's internal stages.

The flagship profile (profile_flagship.py) shows the encoder at ~32 ms
of the 52 ms batch-8 device program. This splits it: cell-id compute,
per-cell stats scatter-add, per-point gather, PFN matmul, and the
canvas scatter-max, each chain-timed like the flagship stages.
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()
    B, N, C = args.batch, 32768, 64
    nx, ny = 432, 496
    ncells = nx * ny

    rng = jax.random.PRNGKey(0)
    points = jax.random.uniform(
        rng, (B, N, 4), jnp.float32,
        minval=jnp.asarray([0.0, -39.68, -3.0, 0.0]),
        maxval=jnp.asarray([69.12, 39.68, 1.0, 1.0]))
    k1, k2 = jax.random.split(rng)
    cell = jax.random.randint(k1, (B, N), 0, ncells, jnp.int32)
    h = jax.random.normal(k2, (B, N, C), jnp.bfloat16)
    feats9 = jax.random.normal(k2, (B, N, 9), jnp.float32)
    w = jax.random.normal(k2, (9, C), jnp.float32)
    valid = jnp.ones((B, N), bool)

    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms")
    it = args.iters

    def rec(name, fn, fargs):
        dt = chain_timer(fn, fargs, it, floor)
        print(f"{name:>28}: {1e3 * dt:8.3f} ms/batch-{B}")

    # (a) cell ids (elementwise)
    def cellid(p):
        ix = jnp.floor((p[..., 0] - 0.0) / 0.16).astype(jnp.int32)
        iy = jnp.floor((p[..., 1] + 39.68) / 0.16).astype(jnp.int32)
        return jnp.sum(iy * nx + ix)
    rec("cell_ids", cellid, (points,))

    # (b) per-cell stats scatter-add (N,4) -> (ncells+1, 4)
    def stats(p, c):
        def one(cc, xyz):
            acc = jnp.zeros((ncells + 1, 4), jnp.float32)
            vals = jnp.concatenate([xyz, jnp.ones_like(xyz[:, :1])], -1)
            return acc.at[cc].add(vals, mode="drop")
        return jnp.sum(jax.vmap(one)(c, p[..., :3]))
    rec("stats_scatter_add", stats, (points, cell))

    # (c) per-point gather from the stats table
    stats_tab = jnp.zeros((B, ncells + 1, 4), jnp.float32)

    def gather(tab, c):
        return jnp.sum(jnp.take_along_axis(tab, c[..., None], axis=1))
    rec("per_point_gather", gather, (stats_tab, cell))

    # (d) PFN matmul (N, 9) @ (9, C)
    def pfn(f, ww):
        return jnp.sum((f.astype(jnp.bfloat16)
                        @ ww.astype(jnp.bfloat16)).astype(jnp.float32))
    rec("pfn_matmul", pfn, (feats9, w))

    # (e) canvas scatter-max (N, C) -> (ncells+1, C)
    def scatmax(hh, c):
        neg = jnp.array(-jnp.inf, hh.dtype)

        def one(cc, hi):
            cv = jnp.full((ncells + 1, C), neg, hi.dtype)
            cv = cv.at[cc].max(hi, mode="drop")
            return cv[:ncells]
        canvas = jax.vmap(one)(c, hh)
        canvas = jnp.where(jnp.isfinite(canvas), canvas, 0.0)
        return jnp.sum(canvas.astype(jnp.float32))
    rec("canvas_scatter_max", scatmax, (h, cell))

    # (e2) canvas scatter-max f32
    rec("canvas_scatter_max_f32", scatmax, (h.astype(jnp.float32), cell))

    # (f) canvas zeros + isfinite only (alloc/cleanup cost)
    def cleanup(hh):
        cv = jnp.full((B, ncells, C), hh[0, 0, 0], hh.dtype)
        return jnp.sum(jnp.where(jnp.isfinite(cv), cv, 0.0)
                       .astype(jnp.float32))
    rec("canvas_alloc_cleanup", cleanup, (h,))

    # (g) sort-based alternative: co-sort points by cell then segment.
    def cosort(p, c):
        ck, px, py, pz, pr = jax.vmap(
            lambda cc, pp: jax.lax.sort(
                (cc, pp[:, 0], pp[:, 1], pp[:, 2], pp[:, 3]),
                dimension=0, num_keys=1))(c, p)
        return jnp.sum(px) + jnp.sum(ck.astype(jnp.float32))
    rec("cosort_points_by_cell", cosort, (points, cell))


if __name__ == "__main__":
    main()

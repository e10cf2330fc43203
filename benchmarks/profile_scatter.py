"""Scatter-strategy shootout for the pillar canvas (O6).

profile_encoder.py shows XLA:TPU scatter cost is per-update-row
serialization (~70 ns/row), not HBM traffic. Candidate replacements:

  1. baseline: .at[cell].max(h) with duplicate, unsorted indices
  2. sorted indices + indices_are_sorted hint (still duplicates)
  3. segment-max via segmented scans, then ONE row per segment start
     scattered with unique_indices=True + indices_are_sorted=True
     (.set — starts are unique by construction)
  4. same but mode='drop' .set without hints (control)

Run: python benchmarks/profile_scatter.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")

import jax
import jax.numpy as jnp

from benchmarks.profile_flagship import chain_timer, measure_sync_floor

B, N, C = 8, 32768, 64
NX, NY = 432, 496
NCELLS = NX * NY


def segmented_max(h, is_start):
    """Per-point inclusive segmented running max along axis 0."""
    def op(a, b):
        av, af = a
        bv, bf = b
        return jnp.where(bf[..., None], bv, jnp.maximum(av, bv)), af | bf
    out, _ = jax.lax.associative_scan(op, (h, is_start))
    return out


def main():
    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    cell = jnp.sort(jax.random.randint(k1, (B, N), 0, NCELLS, jnp.int32),
                    axis=-1)
    cell_unsorted = jax.random.randint(k1, (B, N), 0, NCELLS, jnp.int32)
    h = jnp.abs(jax.random.normal(k2, (B, N, C), jnp.bfloat16))

    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms")

    def rec(name, fn, fargs, iters=10):
        dt = chain_timer(fn, fargs, iters, floor)
        print(f"{name:>34}: {1e3 * dt:8.3f} ms/batch-{B}")

    def v1(hh, cc):
        def one(ci, hi):
            cv = jnp.zeros((NCELLS + 1, C), hi.dtype)
            return cv.at[ci].max(hi, mode="drop")[:NCELLS]
        return jnp.sum(jax.vmap(one)(cc, hh).astype(jnp.float32))
    rec("v1_baseline_unsorted", v1, (h, cell_unsorted))

    def v2(hh, cc):
        def one(ci, hi):
            cv = jnp.zeros((NCELLS + 1, C), hi.dtype)
            return cv.at[ci].max(
                hi, mode="drop", indices_are_sorted=True)[:NCELLS]
        return jnp.sum(jax.vmap(one)(cc, hh).astype(jnp.float32))
    rec("v2_sorted_hint_dup", v2, (h, cell))

    def v3(hh, cc):
        is_start = jnp.concatenate(
            [jnp.ones_like(cc[:, :1], bool), cc[:, 1:] != cc[:, :-1]], -1)
        # reversed scan: max over the segment ends up at the START row.
        segmax = jax.vmap(lambda hi, si: segmented_max(
            hi[::-1], si[::-1])[::-1])(
                hh, jnp.concatenate(
                    [is_start[:, 1:],
                     jnp.ones_like(is_start[:, :1])], -1))
        idx = jnp.where(is_start, cc, NCELLS)

        def one(ci, hi):
            cv = jnp.zeros((NCELLS + 1, C), hi.dtype)
            return cv.at[ci].set(
                hi, mode="drop", indices_are_sorted=True,
                unique_indices=True)[:NCELLS]
        return jnp.sum(jax.vmap(one)(idx, segmax).astype(jnp.float32))
    rec("v3_segscan_unique_sorted_set", v3, (h, cell))

    def v4(hh, cc):
        is_start = jnp.concatenate(
            [jnp.ones_like(cc[:, :1], bool), cc[:, 1:] != cc[:, :-1]], -1)
        idx = jnp.where(is_start, cc, NCELLS)

        def one(ci, hi):
            cv = jnp.zeros((NCELLS + 1, C), hi.dtype)
            return cv.at[ci].set(hi, mode="drop")[:NCELLS]
        return jnp.sum(jax.vmap(one)(idx, hh).astype(jnp.float32))
    rec("v4_starts_set_nohint", v4, (h, cell))

    def v5(hh, cc):
        # scan only (no scatter) — isolates the scan cost in v3
        is_start = jnp.concatenate(
            [jnp.ones_like(cc[:, :1], bool), cc[:, 1:] != cc[:, :-1]], -1)
        segmax = jax.vmap(lambda hi, si: segmented_max(hi, si))(hh, is_start)
        return jnp.sum(segmax.astype(jnp.float32))
    rec("v5_segscan_only", v5, (h, cell))

    def v6(hh, cc):
        # 1-D scatter of a scalar per point (what the stats pass needs)
        def one(ci, hi):
            cv = jnp.zeros((NCELLS + 1,), jnp.float32)
            return cv.at[ci].add(hi[:, 0].astype(jnp.float32), mode="drop")
        return jnp.sum(jax.vmap(one)(cc, hh))
    rec("v6_scalar_scatter_add", v6, (h, cell_unsorted))
    rec("v6s_scalar_scatter_add_sorted", v6, (h, cell))


if __name__ == "__main__":
    main()

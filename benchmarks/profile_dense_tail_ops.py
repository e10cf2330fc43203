"""Attribute the dense-tail glue cost (round 4): mask multiplies,
maxpool dilation, and flatten on the L2/L3 dense grids, isolated.

Run: python benchmarks/profile_dense_tail_ops.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")

import jax
import jax.numpy as jnp
from flax import linen as fnn

from lisec_tpu.bench_lib import chain_time, measure_sync_floor


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 10, 200, 176, 64), jnp.bfloat16)
    act1 = (jax.random.uniform(key, (4, 10, 200, 176, 1)) > 0.5
            ).astype(jnp.bfloat16)
    act64 = jnp.broadcast_to(act1, x.shape)
    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms")

    def rec(name, fn, fargs):
        dt = chain_time(fn, fargs, 10, floor)
        print(f"{name:>28}: {1e3 * dt:8.3f} ms")

    rec("mask-mult (.., 1) act", lambda a, m: jnp.sum(
        (fnn.relu(a * 1.01 + 0.1) * m).astype(jnp.float32)), (x, act1))
    rec("mask-mult (.., 64) act", lambda a, m: jnp.sum(
        (fnn.relu(a * 1.01 + 0.1) * m).astype(jnp.float32)), (x, act64))
    rec("maxpool3 s2 on (.., 1)", lambda m: jnp.sum(
        fnn.max_pool(m, (3, 3, 3), strides=(2, 2, 2),
                     padding=((1, 1), (1, 1), (1, 1))).astype(
                         jnp.float32)), (act1,))
    rec("maxpool3 s2 on (.., 64)", lambda m: jnp.sum(
        fnn.max_pool(m, (3, 3, 3), strides=(2, 2, 2),
                     padding=((1, 1), (1, 1), (1, 1))).astype(
                         jnp.float32)), (act64,))
    rec("flatten transpose", lambda a: jnp.sum(
        a.transpose(0, 2, 3, 1, 4).reshape(4, 200, 176, 640).astype(
            jnp.float32)), (x,))
    # z-edge maxpool alternative: 3 shifted maxes then 2D pool
    def pool_zshift(m):
        mp = jnp.pad(m, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        nz_out = (m.shape[1] + 2 - 3) // 2 + 1
        acc = None
        for dz in range(3):
            sl = jax.lax.slice_in_dim(
                mp, dz, dz + (nz_out - 1) * 2 + 1, 1, axis=1)[:, ::2]
            acc = sl if acc is None else jnp.maximum(acc, sl)
        b, z, ny, nx, c = acc.shape
        h = fnn.max_pool(acc.reshape(b * z, ny, nx, c), (3, 3),
                         strides=(2, 2), padding=((1, 1), (1, 1)))
        return jnp.sum(h.astype(jnp.float32))
    rec("maxpool z-shift (.., 64)", pool_zshift, (act64,))

    # full conv+mask tail on a PRE-scattered dense input (the replica
    # in profile_second measured 104 ms for this part — find out why)
    ws = [jax.random.normal(key, (3, 3, 3, 64, 64), jnp.bfloat16) * 0.05
          for _ in range(5)]

    def conv3(a, w, s):
        return jax.lax.conv_general_dilated(
            a, w, window_strides=(s,) * 3, padding=((1, 1),) * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def tail(a, m):
        h = a
        for i in range(2):
            h = fnn.relu(conv3(h, ws[i], 1) * 1.01 + 0.1) * m
        h = fnn.relu(conv3(h, ws[2], 2) * 1.01 + 0.1)
        m2 = fnn.max_pool(m, (3, 3, 3), strides=(2, 2, 2),
                          padding=((1, 1), (1, 1), (1, 1)))
        h = h * m2
        for i in range(3, 5):
            h = fnn.relu(conv3(h, ws[i], 1) * 1.01 + 0.1) * m2
        b, z, ny, nx, c = h.shape
        return jnp.sum(h.transpose(0, 2, 3, 1, 4).reshape(
            b, ny, nx, z * c).astype(jnp.float32))
    rec("conv tail on dense input", tail, (x, act1))

    # 5 convs alone, chained
    def convs_only(a):
        h = a
        for i in range(2):
            h = conv3(h, ws[i], 1)
        h = conv3(h, ws[2], 2)
        for i in range(3, 5):
            h = conv3(h, ws[i], 1)
        return jnp.sum(h.astype(jnp.float32))
    rec("5 convs chained", convs_only, (x,))

    # Relayout cost: (B, NC, C) voxel-table form -> (B,z,y,x,C) conv
    # form, at 65 lanes (features+indicator packed) vs 64 vs separate.
    flat65 = jax.random.normal(key, (4, 352000, 65), jnp.bfloat16)
    flat64 = jax.random.normal(key, (4, 352000, 64), jnp.bfloat16)

    def via65(d):
        g = d.reshape(4, 10, 200, 176, 65)
        return jnp.sum(conv3(g[..., :64], ws[0], 1).astype(jnp.float32))
    rec("reshape65+slice+conv", via65, (flat65,))

    def via64(d):
        g = d.reshape(4, 10, 200, 176, 64)
        return jnp.sum(conv3(g, ws[0], 1).astype(jnp.float32))
    rec("reshape64+conv", via64, (flat64,))

    def scat64(f):
        lin = jnp.sort(jax.random.randint(
            jax.random.PRNGKey(1), (4, 26624), 0, 352000, jnp.int32), 1)

        def one(xi, li):
            cv = jnp.zeros((352001, 64), xi.dtype)
            return cv.at[li].set(xi, mode="drop")[:-1]
        d = jax.vmap(one)(f, lin)
        g = d.reshape(4, 10, 200, 176, 64)
        return jnp.sum(conv3(g, ws[0], 1).astype(jnp.float32))
    f26 = jax.random.normal(key, (4, 26624, 64), jnp.bfloat16)
    rec("scatter64+reshape+conv", scat64, (f26,))


if __name__ == "__main__":
    main()

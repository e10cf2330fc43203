"""Is a direct 3-spatial-dim conv MXU-friendly on this TPU? (round 4)

A (4, 10, 200, 176, 64) 3x3x3 conv is ~312 GFLOP — ~3 ms at the BEV
backbone's measured 58% MFU. Times the direct lax 3D conv against a
z-decomposition (3 shifted NHWC 2D convs summed — the form XLA:TPU
demonstrably runs at high MFU).

Run: python benchmarks/profile_conv3d.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")

import jax
import jax.numpy as jnp

from lisec_tpu.bench_lib import chain_time, measure_sync_floor


def conv3d_direct(x, w, stride=1):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,) * 3,
        padding=((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32)


def conv3d_zdecomp(x, w, stride=1):
    b, nz, ny, nx, cin = x.shape
    cout = w.shape[-1]
    nz_out = (nz + 2 - 3) // stride + 1
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    ys = None
    for dz in range(3):
        sl = jax.lax.slice_in_dim(
            xp, dz, dz + (nz_out - 1) * stride + 1, 1, axis=1)
        sl = sl[:, ::stride]
        h = sl.reshape(b * nz_out, ny, nx, cin)
        y = jax.lax.conv_general_dilated(
            h, w[dz], window_strides=(stride, stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        ys = y if ys is None else ys + y
    ny_out = (ny + 2 - 3) // stride + 1
    nx_out = (nx + 2 - 3) // stride + 1
    return ys.reshape(b, nz_out, ny_out, nx_out, cout)


def main():
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 10, 200, 176, 64), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 3, 64, 64), jnp.bfloat16) * 0.05
    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms")
    gflop = 2 * 27 * 64 * 64 * x.shape[0] * x.shape[1] * x.shape[2] \
        * x.shape[3] / 1e9

    for name, fn in (("direct NDHWC", conv3d_direct),
                     ("z-decomposed", conv3d_zdecomp)):
        for stride in (1, 2):
            f = lambda a, _s=stride, _f=fn: jnp.sum(_f(a, w, _s))
            dt = chain_time(f, (x,), 10, floor)
            g = gflop / (stride ** 3 if stride == 2 else 1)
            print(f"{name} stride {stride}: {1e3 * dt:8.3f} ms "
                  f"({g / dt / 1e3:6.1f} TFLOP/s)")


if __name__ == "__main__":
    main()

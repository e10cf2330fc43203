"""O12 — spherical range projection (SURVEY.md §2.3 O12).

Reference form: numpy/CUDA projection with a z-buffer. TPU-native
design: deterministic two-scatter z-buffer — (1) per-pixel min range via
``.at[].min``, (2) tie-break to the lowest point index among range
winners, giving exactly one writer per pixel; the image is then a gather
by the per-pixel winner. Fixed H x W, fully on device.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RangeImage(NamedTuple):
    image: jax.Array        # (H, W, 5): range, x, y, z, remission
    image_mask: jax.Array   # (H, W) bool — pixel has a point
    pixel_uv: jax.Array     # (N, 2) int32 (v, u) per point (clamped)
    point_range: jax.Array  # (N,) float
    winner_idx: jax.Array   # (H, W) int32 point index per pixel (or N)


@partial(jax.jit, static_argnames=("height", "width"))
def range_project(
    points: jax.Array,
    point_mask: jax.Array,
    *,
    height: int = 64,
    width: int = 2048,
    fov_up_deg: float = 3.0,
    fov_down_deg: float = -25.0,
) -> RangeImage:
    """Project one padded cloud (N, >=4: x,y,z,remission) to a range image."""
    n = points.shape[0]
    xyz = points[:, :3]
    rem = points[:, 3] if points.shape[1] > 3 else jnp.zeros((n,), points.dtype)
    mask = point_mask.astype(bool)

    r = jnp.linalg.norm(xyz, axis=-1)
    r_safe = jnp.maximum(r, 1e-6)
    yaw = jnp.arctan2(xyz[:, 1], xyz[:, 0])
    pitch = jnp.arcsin(jnp.clip(xyz[:, 2] / r_safe, -1.0, 1.0))

    fov_up = jnp.deg2rad(fov_up_deg)
    fov_down = jnp.deg2rad(fov_down_deg)
    fov = fov_up - fov_down

    u = 0.5 * (1.0 - yaw / jnp.pi) * width
    v = (1.0 - (pitch - fov_down) / fov) * height
    u = jnp.clip(jnp.floor(u), 0, width - 1).astype(jnp.int32)
    v = jnp.clip(jnp.floor(v), 0, height - 1).astype(jnp.int32)

    pix = v * width + u
    pix_valid = jnp.where(mask, pix, height * width)   # trash pixel

    big = jnp.array(jnp.finfo(r.dtype).max, r.dtype)
    # Pass 1: per-pixel min range.
    zmin = jnp.full((height * width + 1,), big, r.dtype)
    zmin = zmin.at[pix_valid].min(jnp.where(mask, r, big), mode="drop")
    # Pass 2: lowest point index among range winners (unique writer).
    is_winner = mask & (r <= zmin[pix_valid])
    widx = jnp.full((height * width + 1,), n, jnp.int32)
    widx = widx.at[jnp.where(is_winner, pix_valid, height * width)].min(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    winner = widx[:height * width]

    feats = jnp.concatenate([r[:, None], xyz, rem[:, None]], axis=-1)  # (N,5)
    feats_pad = jnp.concatenate([feats, jnp.zeros((1, 5), feats.dtype)])
    image = feats_pad[jnp.minimum(winner, n)].reshape(height, width, 5)
    image_mask = (winner < n).reshape(height, width)
    image = jnp.where(image_mask[..., None], image, 0.0)

    return RangeImage(
        image=image,
        image_mask=image_mask,
        pixel_uv=jnp.stack([v, u], axis=-1),
        point_range=r,
        winner_idx=winner.reshape(height, width),
    )


def range_unproject(pixel_values: jax.Array, pixel_uv: jax.Array) -> jax.Array:
    """Read back per-point values from a (H, W, ...) image at (v, u)."""
    return pixel_values[pixel_uv[:, 0], pixel_uv[:, 1]]

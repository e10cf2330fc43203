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
    pixel_pix: jax.Array    # (N,) int32 flat pixel id v*W + u (clamped;
                            # what O13 consumes — the (N, 2) uv form
                            # tile-pads its minor dim 2 -> 128 lanes)


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
        pixel_pix=pix,
    )


def range_unproject(pixel_values: jax.Array, pixel_uv: jax.Array) -> jax.Array:
    """Read back per-point values from a (H, W, ...) image at (v, u)."""
    return pixel_values[pixel_uv[:, 0], pixel_uv[:, 1]]


@partial(jax.jit, static_argnames=("height", "width", "interpret"))
def range_project_batch(
    points: jax.Array,         # (B, N, >=4)
    point_mask: jax.Array,     # (B, N)
    *,
    height: int = 64,
    width: int = 2048,
    fov_up_deg: float = 3.0,
    fov_down_deg: float = -25.0,
    interpret: bool = False,
) -> RangeImage:
    """Batched O12 on the sort+paint path (round 5).

    The two-scatter z-buffer (`range_project`) pays XLA's ~2 GB/s
    scatter ceiling on every one of the B x N budget rows — measured
    32.3 ms/batch-8 at the 131072-point SemanticKITTI budget, 28% of
    the whole range-seg predict (benchmarks/profile_rangeseg.py). This
    form replaces both scatters with the framework's standard bulk
    router: ONE 3-key lexicographic co-sort (pixel, range, point index
    — so each pixel segment's FIRST row is exactly the deterministic
    winner: min range, ties to lowest index) and ONE 8-lane paint of
    the winner rows (monotone unique-target routing at matmul speed,
    ops/pallas/pillar_paint.py). Padding sorts to the trash tail, so
    sparse fixtures pay for their points, not their budget. Winner
    indices ride a float lane (N < 2^23 exact). Output-identical to
    ``jax.vmap(range_project)`` (tests/test_rangeseg.py)."""
    from lisec_tpu.ops.pallas.pillar_paint import segment_paint

    b, n = points.shape[0], points.shape[1]
    xyz = points[..., :3]
    rem = (points[..., 3] if points.shape[-1] > 3
           else jnp.zeros((b, n), points.dtype))
    mask = point_mask.astype(bool)

    r = jnp.linalg.norm(xyz, axis=-1)
    r_safe = jnp.maximum(r, 1e-6)
    yaw = jnp.arctan2(xyz[..., 1], xyz[..., 0])
    pitch = jnp.arcsin(jnp.clip(xyz[..., 2] / r_safe, -1.0, 1.0))
    fov_up = jnp.deg2rad(fov_up_deg)
    fov_down = jnp.deg2rad(fov_down_deg)
    fov = fov_up - fov_down
    u = 0.5 * (1.0 - yaw / jnp.pi) * width
    v = (1.0 - (pitch - fov_down) / fov) * height
    u = jnp.clip(jnp.floor(u), 0, width - 1).astype(jnp.int32)
    v = jnp.clip(jnp.floor(v), 0, height - 1).astype(jnp.int32)

    hw = height * width
    pix = jnp.where(mask, v * width + u, hw)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (b, n))
    pix_s, rs, idx_s, xs, ys, zs, rems = jax.lax.sort(
        (pix, r, idx, xyz[..., 0], xyz[..., 1], xyz[..., 2], rem),
        dimension=1, num_keys=3)

    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, pix_s.dtype), pix_s[:, :-1]], axis=1)
    start = (pix_s != prev) & (pix_s < hw)
    w = start.astype(jnp.float32)[..., None]
    # Winner index rides TWO channels (idx // 256, idx % 256): the
    # paint routes values through a bf16 hi+mid split, which is exact
    # only up to ~16 significant bits — a raw 131072-point index is
    # not. Both halves are small integers, so the 2-pass route carries
    # them exactly.
    svals = jnp.concatenate([
        jnp.stack([rs, xs, ys, zs, rems,
                   (idx_s // 256).astype(jnp.float32),
                   (idx_s % 256).astype(jnp.float32)], axis=-1) * w,
        w], axis=-1)                                       # (B, N, 8)
    # Cell stream must stay ascending for the kernel's segment scans;
    # non-winner rows are masked to 0 in the VALUES (w), so each
    # pixel's segment-sum is exactly its winner row and the count
    # channel carries the start flag (1 per occupied pixel).
    tab = segment_paint(
        svals, pix_s, num_cells=hw, num_max=0,
        count_channel=7, slab=2048, window=512, interpret=interpret)

    occupied = tab[..., 7] > 0.0                           # (B, HW)
    image = jnp.where(occupied[..., None], tab[..., :5], 0.0)
    widx = (tab[..., 5].astype(jnp.int32) * 256
            + tab[..., 6].astype(jnp.int32))
    winner = jnp.where(occupied, widx, n)
    return RangeImage(
        image=image.reshape(b, height, width, 5),
        image_mask=occupied.reshape(b, height, width),
        pixel_uv=jnp.stack([v, u], axis=-1),
        point_range=r,
        winner_idx=winner.reshape(b, height, width),
        pixel_pix=v * width + u,
    )

"""Quantized host->device wire format for point batches.

The end-to-end driver metric (BASELINE.json:2 "clouds/sec/chip
end-to-end") pays for every byte that crosses the host<->device link —
on this box a ~25-30 MB/s tunnel, on a production host PCIe. A padded
float32 KITTI batch ships 16 wasteful bytes per point (4 x f32) plus a
(B, N) bool validity mask. This module halves-plus the wire bytes with
no measurable accuracy cost:

* points cross as **int16** fixed-point against per-channel bounds
  computed from the batch (min/max of valid points). For KITTI geometry
  the xyz span is <= ~80 m, so the worst-case rounding error is
  80 / 65535 ~ 1.2 mm — an order of magnitude below lidar sensor noise
  (~2 cm) and two orders below the 0.16 m pillar size.
* the (B, N) bool mask is replaced by a (B,) int32 **count** (padded
  batches are prefix-valid; `pack_points_q16` compacts defensively if
  given a non-prefix mask). The mask is rebuilt on device with an iota
  compare.

Measured on this box (same session, batch 32 x 32768 x 4): f32+mask
dispatch 777-927 ms, int16 393 ms. H2D/compute double-buffering was
measured NEUTRAL here (`jax.device_put` is synchronous through the axon
tunnel; 4x pipelined put+compute = 1491 ms vs 1356 ms sequential) — on
locally-attached TPUs the standard double-buffered input feed applies,
but on this box bytes are the only lever.

Quantization is for the WIRE only: the device program dequantizes to
f32 before voxelize, and all goldens/eval paths keep the exact f32
path. Reference-class stacks ship raw f32 over PCIe (SURVEY.md §3.1);
this is a TPU-era replacement, not a translation.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

WIRE_LEVELS = 65535  # int16 full-scale


def pack_points_q16(points: np.ndarray,
                    point_mask: np.ndarray) -> Dict[str, np.ndarray]:
    """Quantize a padded (B, N, C) f32 batch to the int16 wire format.

    Returns a dict:
      points_q16  (B, N, C) int16 — fixed-point codes
      num_points  (B,)      int32 — valid prefix length per cloud
      wire_lo     (C,)      f32   — per-channel dequant offset
      wire_scale  (C,)      f32   — per-channel dequant step

    Padding slots encode `wire_lo` (code -32768) so they dequantize to
    the channel minimum; they are masked out on device anyway.
    """
    points = np.asarray(points, np.float32)
    mask = np.asarray(point_mask, bool)
    if points.ndim != 3:
        raise ValueError(f"expected (B, N, C) points, got {points.shape}")
    b, n, c = points.shape

    counts = mask.sum(axis=1).astype(np.int32)
    prefix = mask == (np.arange(n)[None, :] < counts[:, None])
    if not prefix.all():
        # Stable-compact valid points to the row prefix (keeps the
        # deterministic budget-overflow order of ops/voxelize.py).
        packed = np.zeros_like(points)
        for i in range(b):
            sel = points[i][mask[i]]
            packed[i, : len(sel)] = sel
        points = packed

    valid = np.arange(n)[None, :] < counts[:, None]
    any_valid = valid.any()
    if any_valid:
        big = np.where(valid[..., None], points, np.inf)
        small = np.where(valid[..., None], points, -np.inf)
        lo = big.min(axis=(0, 1))
        hi = small.max(axis=(0, 1))
    else:
        lo = np.zeros((c,), np.float32)
        hi = np.ones((c,), np.float32)
    lo = lo.astype(np.float32)
    span = np.maximum((hi - lo).astype(np.float32), 1e-6)
    scale = span / WIRE_LEVELS

    q = np.rint((points - lo) / scale) - 32768.0
    q = np.clip(q, -32768, 32767).astype(np.int16)
    q[~valid] = -32768
    return {
        "points_q16": q,
        "num_points": counts,
        "wire_lo": lo,
        "wire_scale": scale.astype(np.float32),
    }


def unpack_points_q16(packed: Dict) -> Dict:
    """Device-side dequantize (jnp; runs inside the jitted program).

    Returns {"points": (B, N, C) f32, "point_mask": (B, N) bool} plus
    any extra keys carried through (gt_* etc. are not quantized).
    """
    import jax.numpy as jnp

    q = packed["points_q16"]
    counts = packed["num_points"]
    lo = packed["wire_lo"].astype(jnp.float32)
    scale = packed["wire_scale"].astype(jnp.float32)
    pts = (q.astype(jnp.float32) + 32768.0) * scale + lo
    n = q.shape[1]
    mask = jnp.arange(n, dtype=counts.dtype)[None, :] < counts[:, None]
    out = {k: v for k, v in packed.items()
           if k not in ("points_q16", "num_points", "wire_lo",
                        "wire_scale")}
    out["points"] = pts
    out["point_mask"] = mask
    return out

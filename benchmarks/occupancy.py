"""BEV canvas occupancy study (r3 verdict #1: the dense-backbone
ceiling).

Measures, for (a) the repo's fixture scenes and (b) a synthetic
64-beam "real-KITTI-geometry" raycast (ground plane + walls + cars,
0.09 deg azimuth steps over the front 90 deg FOV — the densities real
velodyne frames have after the camera-FOV crop), on the production
432 x 496 pillar canvas:

  * nonzero-pillar fraction;
  * ACTIVE-TILE fraction per backbone stage, with activity dilated by
    the receptive-field growth of every conv that runs at that stage
    (3x3 conv dilates the active set by 1 cell) — what a block-sparse
    (gather tiles -> dense conv -> scatter) backbone could skip;
  * the FLOP fraction an ideal active-tile backbone would keep, and
    the gather/scatter HBM bytes it would pay at the MEASURED ~2 GB/s
    data-dependent-movement ceiling (benchmarks/profile_scatter.py),
    vs the time the skipped FLOPs save at the backbone's measured
    ~58% MFU.

Run: python benchmarks/occupancy.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PC_RANGE = (0.0, -39.68, -3.0, 69.12, 39.68, 1.0)
GRID = (432, 496)                       # (nx, ny)
VOX = 0.16

# Backbone geometry (models/pointpillars.py defaults): three blocks,
# each opens with a stride-2 conv then `layers` stride-1 convs.
BLOCKS = [(2, 3, 64), (2, 5, 128), (2, 5, 256)]   # (stride, convs, ch)

MEASURED_GATHER_GBPS = 2.0      # data-dependent movement ceiling (r1)
MEASURED_MFU = 0.58             # dense backbone (docs/ARCHITECTURE.md)
PEAK_TFLOPS = 197e12


def synthetic_kitti_frame(seed: int) -> np.ndarray:
    """64-beam raycast: ground + a few walls + ~8 cars, front 90 deg."""
    rng = np.random.default_rng(seed)
    elev = np.deg2rad(np.linspace(-24.8, 2.0, 64))        # HDL-64 span
    azim = np.deg2rad(np.arange(-45, 45, 0.09))           # ~1000 cols
    E, A = np.meshgrid(elev, azim, indexing="ij")
    # Ground at z = -1.73 (sensor height): range = h / -sin(elev).
    with np.errstate(divide="ignore"):
        r_ground = np.where(E < -0.005, 1.73 / -np.sin(E), np.inf)
    r = r_ground
    # Cars: boxes at random positions occlude the ray at their range.
    for _ in range(int(rng.integers(4, 12))):
        cx = rng.uniform(5, 55)
        cy = rng.uniform(-25, 25)
        az_c = np.arctan2(cy, cx)
        rr = np.hypot(cx, cy)
        half_w = np.arctan2(1.2, rr)
        hit_az = np.abs(A - az_c) < half_w
        # visible height band of a ~1.6 m tall car at that range
        el_lo = np.arctan2(-1.73, rr)
        el_hi = np.arctan2(-0.2, rr)
        hit = hit_az & (E > el_lo) & (E < el_hi)
        r = np.where(hit & (rr < r), rr + rng.normal(0, 0.05), r)
    # A couple of walls/buildings.
    for _ in range(int(rng.integers(1, 4))):
        az_c = rng.uniform(-0.7, 0.7)
        rr = rng.uniform(20, 65)
        half_w = rng.uniform(0.05, 0.3)
        hit = (np.abs(A - az_c) < half_w) & (E > np.arctan2(-1.73, rr))
        r = np.where(hit & (rr < r), rr, r)
    ok = np.isfinite(r) & (r < 80) & (r > 2)
    x = (r * np.cos(E) * np.cos(A))[ok]
    y = (r * np.cos(E) * np.sin(A))[ok]
    z = (r * np.sin(E))[ok] + rng.normal(0, 0.02, ok.sum())
    return np.stack([x, y, z], -1)


def fixture_frame(seed: int) -> np.ndarray:
    from lisec_tpu.data.fixtures import make_detection_scene
    return make_detection_scene(seed)["points"][:, :3]


def pillar_mask(pts: np.ndarray) -> np.ndarray:
    nx, ny = GRID
    ix = np.floor((pts[:, 0] - PC_RANGE[0]) / VOX).astype(int)
    iy = np.floor((pts[:, 1] - PC_RANGE[1]) / VOX).astype(int)
    ok = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
          & (pts[:, 2] >= PC_RANGE[2]) & (pts[:, 2] < PC_RANGE[5]))
    m = np.zeros((ny, nx), bool)
    m[iy[ok], ix[ok]] = True
    return m


def dilate(m: np.ndarray, it: int) -> np.ndarray:
    for _ in range(it):
        p = np.pad(m, 1)
        m = (p[:-2, :-2] | p[:-2, 1:-1] | p[:-2, 2:]
             | p[1:-1, :-2] | p[1:-1, 1:-1] | p[1:-1, 2:]
             | p[2:, :-2] | p[2:, 1:-1] | p[2:, 2:])
    return m


def pool2(m: np.ndarray) -> np.ndarray:
    ny, nx = m.shape
    return m[: ny // 2 * 2, : nx // 2 * 2].reshape(
        ny // 2, 2, nx // 2, 2).any(axis=(1, 3))


def tile_fraction(m: np.ndarray, t: int) -> float:
    ny, nx = m.shape
    py, px = -(-ny // t) * t, -(-nx // t) * t
    mp = np.zeros((py, px), bool)
    mp[:ny, :nx] = m
    tiles = mp.reshape(py // t, t, px // t, t).any(axis=(1, 3))
    return float(tiles.mean())


def analyse(name: str, frames) -> None:
    nx, ny = GRID
    print(f"\n== {name} ==")
    pillar_fracs, stage_stats = [], []
    for pts in frames:
        m = pillar_mask(pts)
        pillar_fracs.append(m.mean())
        stages = []
        cur = m
        for stride, convs, ch in BLOCKS:
            cur = pool2(cur)              # stride-2 conv: halves grid
            cur = dilate(cur, 1 + convs)  # its 3x3 + the stride-1 convs
            stages.append(cur.copy())
        stage_stats.append(stages)
    print(f"nonzero pillars: {np.mean(pillar_fracs) * 100:.1f}% of "
          f"{nx * ny} cells ({np.mean(pillar_fracs) * nx * ny:.0f})")

    total_dense_flops, total_active_flops = 0.0, 0.0
    gather_bytes = 0.0
    res = (ny, nx)
    ch_in = 64
    for si, (stride, convs, ch) in enumerate(BLOCKS):
        res = (res[0] // 2, res[1] // 2)
        act = np.mean([s[si].mean() for s in stage_stats])
        t16 = np.mean([tile_fraction(s[si], 16) for s in stage_stats])
        t32 = np.mean([tile_fraction(s[si], 32) for s in stage_stats])
        n_conv = 1 + convs
        flops = n_conv * res[0] * res[1] * ch * max(ch_in, ch) * 9 * 2
        total_dense_flops += flops
        total_active_flops += flops * t16
        # block-sparse would gather+scatter each stage's activations
        # (bf16) once per conv
        gather_bytes += (2 * n_conv * res[0] * res[1] * ch * 2) * t16
        ch_in = ch
        print(f"stage {si}: {res[0]}x{res[1]}x{ch}  active cells "
              f"{act * 100:5.1f}%  tiles16 {t16 * 100:5.1f}%  "
              f"tiles32 {t32 * 100:5.1f}%")

    keep = total_active_flops / total_dense_flops
    dense_ms = total_dense_flops / (PEAK_TFLOPS * MEASURED_MFU) * 1e3
    saved_ms = dense_ms * (1 - keep)
    gather_ms = gather_bytes / (MEASURED_GATHER_GBPS * 1e9) * 1e3
    print(f"FLOPs kept by 16-tile active backbone: {keep * 100:.1f}% "
          f"(dense {total_dense_flops / 1e9:.1f} GFLOP/cloud)")
    print(f"per cloud: dense conv time ~{dense_ms:.2f} ms, saved "
          f"~{saved_ms:.2f} ms, tile gather+scatter at measured "
          f"{MEASURED_GATHER_GBPS:.0f} GB/s ~{gather_ms:.2f} ms "
          f"-> {'WIN' if gather_ms < saved_ms else 'LOSS'} "
          f"({gather_ms / max(saved_ms, 1e-9):.1f}x the savings)")


def main():
    analyse("fixture scenes (data/fixtures.py, 8 seeds)",
            [fixture_frame(s) for s in range(8)])
    analyse("synthetic 64-beam KITTI geometry (8 seeds)",
            [synthetic_kitti_frame(s) for s in range(8)])


if __name__ == "__main__":
    main()

"""Fully-fused pillar-encoder kernel: sorted raw points -> BEV canvas.

Round-3 rework of the inference encoder (SURVEY.md §2.3 O1/O6 + §2.2
M3). Round 2 composed it as XLA glue around the generic slab-paint
kernel: pack 128-lane point records -> transpose -> paint an f32
(B, cells, 128) table -> read the table back for the BN/mean/center
epilogue. Measured cost 14.8 ms/batch-8 (kernel 8.3 + glue 6.5),
dominated by the ~880 MB f32 table write + re-read and by scanning
2x128 sublanes per window when only 64 need max and 4 need sum
(docs/ROUND3_NOTES.md "cheap wins").

This kernel does the whole encoder in one pass:

  1. XLA co-sorts (cell, x, y, z, r) — the only data-dependent
     movement, at lax.sort speed — and stacks (B, 8, N) channels
     [x, y, z, r, 1, 0, 0, 0]. Measured: this glue is ~0.9 ms of the
     ~10 ms round-3a encoder; everything else is in-kernel.
  2. Each slab program consumes ITS OWN point range in windows whose
     start is the range start rounded DOWN to a 128-lane boundary
     (Mosaic requires provably tile-aligned DMA lane offsets); the
     <=127 leading points belong to earlier slabs and are masked.
  3. Per window the kernel computes the per-point PFN linear term
     u = [x,y,z,r,1] @ [weff; BIG] in-register — weff folds the
     absolute-decoration columns (feats_abs = [x,y,z,r,x,y,z,x,y] so
     weff = [w0+w4+w7, w1+w5+w8, w2+w6, w3]) and BIG is a per-channel
     static bound with BIG_c > |u_c| for every in-range point, so
     u + BIG > 0 always. Then a segmented MAX-scan over u's C
     sublanes and a segmented SUM-scan over the 8 stat sublanes.
  4. One one-hot MXU matmul routes each cell's segment end
     (max(u+BIG) | sum x,y,z,count) to its slab row of a SINGLE
     zero-initialized (slab, C+16) f32 accumulator. The positive
     shift makes the merge UNCONDITIONAL — rows with no segment end
     route 0.0, which max-merges as a no-op — so there is no
     per-window `has-end` gating over the slab (measured ~1.4 us of
     the ~5.5 us/window round-3a budget). Stats stay exact through
     bf16 routing via an in-lane hi/lo split (lanes C..C+16 of the
     same matmul, recombined in the epilogue); u rides a single bf16
     lane when the canvas is bf16 anyway (`split_u=False`), or its
     own hi/lo pair when an f32 canvas asks for more (`split_u=True`,
     two matmuls — the round-3a configuration).
  5. The per-cell epilogue runs in-kernel on the accumulator:
     canvas = relu(max(u) - mean @ w[4:7] - center_bias + t), 0 where
     empty. The center bias (a pure function of the cell index) is
     precomputed by XLA and streamed in per slab — integer div/mod by
     a non-power-of-2 grid width inside the kernel measured ~6 ms
     across the 840 grid programs. The canvas is written ONCE, in the
     compute dtype (bf16 for the backbone), never a 128-lane f32
     table.

BatchNorm is folded into (w, t) by the caller (inference only; the
training path lives in models/pillar_encoder.py).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _encoder_kernel(offs_ref, pts_hbm, cell_hbm, weffT_ref, wrows_ref,
                    cbias_ref, out_ref, pts_s, cell_s, acc, sems,
                    *, slab: int, window: int, c: int, split_u: bool,
                    ablate: str = ""):
    # ``ablate`` is a BENCHMARK-ONLY cost-attribution switch
    # (benchmarks/profile_encoder.py): "scan" skips the u/st segmented
    # scans, "route" replaces the one-hot routing matmul with a cheap
    # anti-DCE reduce, "segid" skips the segment-geometry scan, "epi"
    # skips the BN/mean epilogue. Production always passes "".
    b = pl.program_id(0)
    s = pl.program_id(1)
    # DMA lane offsets must be provably 128-aligned on TPU, so windows
    # start at lo rounded DOWN to a vreg lane boundary; the <=127
    # leading points belong to earlier slabs and are masked by
    # `inrange` below (cell < base).
    lo0 = offs_ref[b, s]
    lo = (lo0 // LANES) * LANES
    hi = offs_ref[b, s + 1]
    base = s * slab
    w = window

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (slab, w), 0)
    nsum = 8 if split_u else 16       # st width (hi/lo pair when 16)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (slab, c + nsum), 1)
    is_max_lane = out_lane < c

    acc[:] = jnp.zeros_like(acc)

    # Empty ranges (hi <= lo0) skip entirely — with lo aligned DOWN an
    # empty slab could otherwise still see one window of foreign points
    # (all masked, pure waste).
    nwin = jnp.where(hi > lo0, (hi - lo - 1) // w + 1, 0)

    def copies(wi, slot):
        start = pl.multiple_of(lo + wi * w, LANES)
        return (
            pltpu.make_async_copy(
                pts_hbm.at[b, :, pl.ds(start, w)],
                pts_s.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                cell_hbm.at[b, :, pl.ds(start, w)],
                cell_s.at[slot], sems.at[slot, 1]),
        )

    @pl.when(nwin > 0)
    def _():
        for cp in copies(0, 0):
            cp.start()

    def body(wi, _):
        slot = jax.lax.rem(wi, 2)
        @pl.when(wi + 1 < nwin)
        def _():
            for cp in copies(wi + 1, 1 - slot):
                cp.start()
        for cp in copies(wi, slot):
            cp.wait()

        cell = cell_s[slot]                                # (1, w)
        blk = pts_s[slot]                                  # (8, w)
        inrange = (cell >= base) & (cell < base + slab)
        local = jnp.where(inrange, cell - base, slab)

        # Segment geometry along the sorted point axis.
        prev = pltpu.roll(local, shift=1, axis=1)
        if "segid" in ablate:
            dist = lane
        else:
            is_start = (local != prev) | (lane == 0)
            seg_start = jnp.where(is_start, lane, -1)
            sh = 1
            while sh < w:
                rolled = pltpu.roll(seg_start, shift=sh, axis=1)
                rolled = jnp.where(lane >= sh, rolled, -1)
                seg_start = jnp.maximum(seg_start, rolled)
                sh *= 2
            dist = lane - seg_start                        # (1, w)

        # Per-point shifted PFN linear term u + BIG (C, w): 5 exact
        # f32 broadcast FMAs (absolute coords do not survive bf16/MXU
        # passes); the ones channel carries the positive shift.
        u = weffT_ref[:, 0:1] * blk[0:1]
        for i in (1, 2, 3, 4):
            u = u + weffT_ref[:, i:i + 1] * blk[i:i + 1]
        u = jnp.where(inrange, u, 0.0)                     # 0 == -inf
        st = jnp.where(inrange, blk, 0.0)                  # (8, w)
        # NOTE: u stays f32 through the scan — Mosaic's lane rotate
        # only supports 32-bit data ("Rotate with non-32-bit data" on
        # v5e); the bf16 cast happens at the routing matmul instead.

        # Segmented max-scan (u) + sum-scan (stats).
        if "scan" not in ablate:
            sh = 1
            while sh < w:
                ok = dist >= sh
                ru = pltpu.roll(u, shift=sh, axis=1)
                ru = jnp.where(lane >= sh, ru, jnp.zeros_like(u))
                u = jnp.where(ok, jnp.maximum(u, ru), u)
                rs = pltpu.roll(st, shift=sh, axis=1)
                rs = jnp.where(lane >= sh, rs, 0.0)
                st = jnp.where(ok, st + rs, st)
                sh *= 2

        # Route segment ends to slab rows with one-hot MXU matmuls —
        # exact selection for maxes, exact hi/lo-split addition for
        # sums; empty rows route 0.0 which merges as a no-op.
        if "route" in ablate:
            # Anti-DCE: keep the scan results live without the one-hot
            # build/matmul so (full - this) isolates the routing cost.
            acc[0, 0] = acc[0, 0] + jnp.max(u) + jnp.max(st)
            return 0
        nxt = pltpu.roll(local, shift=w - 1, axis=1)       # circular -1
        is_end = (local != nxt) | (lane == w - 1)
        r_end = ((rows_w == local) & is_end).astype(jnp.bfloat16)
        st_hi = st.astype(jnp.bfloat16)
        st_lo = (st - st_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        if split_u:
            u_hi = u.astype(jnp.bfloat16)
            u_lo = (u - u_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            cat_hi = jnp.concatenate([u_hi, st_hi], axis=0)
            cat_lo = jnp.concatenate([u_lo, st_lo], axis=0)
            routed = (
                jax.lax.dot_general(r_end, cat_hi, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(r_end, cat_lo, dimension_numbers=dn,
                                      preferred_element_type=jnp.float32)
            )                                              # (slab, C+8)
        else:
            cat = jnp.concatenate([u.astype(jnp.bfloat16), st_hi, st_lo],
                                  axis=0)
            routed = jax.lax.dot_general(
                r_end, cat, dimension_numbers=dn,
                preferred_element_type=jnp.float32)        # (slab, C+16)
        a = acc[:]
        acc[:] = jnp.where(is_max_lane, jnp.maximum(a, routed),
                           a + routed)
        return 0

    jax.lax.fori_loop(0, nwin, body, 0)

    # In-kernel epilogue: canvas = relu((umax - BIG) - mean @ w[4:7]
    # - center_bias + t), zero where the cell is empty.
    a = acc[:]
    if "epi" in ablate:
        out_ref[0] = a[:, :c].astype(out_ref.dtype)
        return

    def stat(i):
        if split_u:
            return a[:, c + i:c + i + 1]
        return a[:, c + i:c + i + 1] + a[:, c + 8 + i:c + 8 + i + 1]

    cnt = stat(4)
    safe = jnp.maximum(cnt, 1.0)
    b_cell = (
        (stat(0) / safe) * wrows_ref[0:1]
        + (stat(1) / safe) * wrows_ref[1:2]
        + (stat(2) / safe) * wrows_ref[2:3]
        + cbias_ref[0]
    )                                                      # (slab, C)
    umax = a[:, :c] - wrows_ref[4:5]                       # undo +BIG
    canvas = jnp.maximum(umax - b_cell + wrows_ref[3:4], 0.0)
    canvas = jnp.where(cnt > 0.0, canvas, 0.0)
    out_ref[0] = canvas.astype(out_ref.dtype)


@partial(jax.jit, static_argnames=(
    "grid", "voxel_size", "pc_range", "slab", "window", "out_dtype",
    "interpret", "ablate"))
def pillar_canvas_fused(
    points: jax.Array,         # (B, N, 4) f32: x, y, z, reflectance
    point_mask: jax.Array,     # (B, N) bool/int
    w: jax.Array,              # (9, C) f32 — BN-folded PFN weights
    t: jax.Array,              # (C,) f32 — BN-folded bias
    *,
    grid: Tuple[int, int],     # (nx, ny)
    voxel_size: Tuple[float, float],
    pc_range: Tuple[float, ...],
    slab: int = 2048,
    window: int = 256,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
    ablate: str = "",          # benchmark-only, see _encoder_kernel
) -> jax.Array:
    """One-kernel pillar encoder: returns the (B, ny*nx, C) canvas.

    With ``out_dtype=bfloat16`` (production) the per-point term rides a
    single bf16 routing lane — its rounding (~BIG * 2^-9) sits below
    the bf16 canvas quantization. Any wider ``out_dtype`` routes u as
    an exact hi/lo bf16 pair (two matmuls, the round-3a arrangement).
    """
    assert window % LANES == 0, "window must be a multiple of 128 lanes"
    split_u = jnp.dtype(out_dtype).itemsize > 2
    b, n, _ = points.shape
    c = w.shape[1]
    nx, ny = grid
    ncells = nx * ny
    r = pc_range

    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    ix = jnp.floor((x - r[0]) / voxel_size[0]).astype(jnp.int32)
    iy = jnp.floor((y - r[1]) / voxel_size[1]).astype(jnp.int32)
    valid = ((ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
             & (z >= r[2]) & (z < r[5]) & point_mask.astype(bool))
    cell = jnp.where(valid, iy * nx + ix, ncells)

    cell_s, xs, ys, zs, rs = jax.lax.sort(
        (cell, points[..., 0], points[..., 1], points[..., 2],
         points[..., 3]), dimension=1, num_keys=1)

    num_slabs = -(-ncells // slab)
    padded_cells = num_slabs * slab
    # Pad the stream to a window multiple PLUS one window of slack so
    # final windows (start rounded down, up to one window of overrun)
    # stay in bounds.
    pad = (window - n % window) % window + window
    z8 = jnp.zeros((b, pad), jnp.float32)
    xs, ys, zs, rs = (jnp.concatenate([a, z8], axis=1)
                      for a in (xs, ys, zs, rs))
    cell_pad = jnp.concatenate(
        [cell_s, jnp.full((b, pad), padded_cells, cell_s.dtype)], axis=1)

    ones = jnp.ones((b, n + pad), jnp.float32)
    zero = jnp.zeros((b, n + pad), jnp.float32)
    pts8 = jnp.stack([xs, ys, zs, rs, ones, zero, zero, zero], axis=1)

    bounds = jnp.arange(num_slabs + 1, dtype=jnp.int32) * slab
    offsets = jax.vmap(
        lambda cc: jnp.searchsorted(cc[:n], bounds, side="left"))(
            cell_pad).astype(jnp.int32)

    # weff folds the absolute-decoration columns of the 9-ch PFN:
    # feats_abs = [x,y,z,r,x,y,z,x,y] => u = [x,y,z,r] @ weff.
    weff = jnp.stack([w[0] + w[4] + w[7], w[1] + w[5] + w[8],
                      w[2] + w[6], w[3]], axis=0)           # (4, C)
    # Per-channel positive shift: BIG_c > |u_c| for every in-range
    # point, so u + BIG > 0 and the routed 0.0 of end-less rows acts
    # as -inf in the accumulator max-merge.
    coord_max = jnp.asarray(
        [max(abs(r[0]), abs(r[3])), max(abs(r[1]), abs(r[4])),
         max(abs(r[2]), abs(r[5])), 1.0], jnp.float32)
    bigc = jnp.abs(weff).T @ coord_max + 1.0                # (C,)
    weffT = jnp.concatenate(
        [weff.T, bigc[:, None], jnp.zeros((c, 3), jnp.float32)],
        axis=1)                                             # (C, 8)
    wrows = jnp.concatenate(
        [w[4:7], t[None], bigc[None]], axis=0)              # (5, C)

    # Per-cell center bias center @ w[7:9], precomputed by XLA (tiny
    # matmul) and streamed per slab — integer div/mod by the grid
    # width inside the kernel is ~VPU-pathological.
    idx = jnp.arange(padded_cells, dtype=jnp.int32)
    px = ((idx % nx).astype(jnp.float32) + 0.5) * voxel_size[0] + r[0]
    py = ((idx // nx).astype(jnp.float32) + 0.5) * voxel_size[1] + r[1]
    cbias = (jnp.stack([px, py], axis=-1) @ w[7:9]).astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_slabs),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # pts (B,8,N')
            pl.BlockSpec(memory_space=pl.ANY),             # cell (B,1,N')
            pl.BlockSpec((c, 8), lambda b_, s_, offs: (0, 0)),
            pl.BlockSpec((5, c), lambda b_, s_, offs: (0, 0)),
            pl.BlockSpec((1, slab, c), lambda b_, s_, offs: (s_, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, slab, c), lambda b_, s_, offs: (b_, s_, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, 8, window), jnp.float32),       # double buffer
            pltpu.VMEM((2, 1, window), jnp.int32),
            pltpu.VMEM((slab, c + (8 if split_u else 16)),
                       jnp.float32),                       # max|sum acc
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        partial(_encoder_kernel, slab=slab, window=window, c=c,
                split_u=bool(split_u), ablate=ablate),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, padded_cells, c), out_dtype),
        interpret=interpret,
    )(offsets, pts8, cell_pad[:, None, :], weffT, wrows,
      cbias.reshape(num_slabs, slab, c))
    return out[:, :ncells]

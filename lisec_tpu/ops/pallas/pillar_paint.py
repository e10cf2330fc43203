"""Pallas slab-paint kernel: sorted points -> dense per-cell (max, sum).

The TPU-native replacement for the pillar scatter-max + per-cell stats
scatter-add (O1/O6, SURVEY.md §2.3). Measured on the v5e chip, XLA
data-dependent scatters/gathers run at ~2 GB/s effective no matter what
hints (sorted/unique) they carry — the 8x32768-row canvas scatter alone
costs ~18 ms/batch-8, 61% of the whole inference program. Multi-operand
sorts, by contrast, are ~free (0.5 ms for 8x32768x5). So:

  1. XLA co-sorts points by linearized cell id (cheap) and packs the
     per-point values channels-on-sublanes: (B, 128ch, N).
  2. This kernel walks the canvas in **slabs** of `slab` consecutive
     cells; grid = (batch, slab). Each slab's points are a contiguous
     sorted range [offsets[b,s], offsets[b,s+1]) (offsets = one
     vectorized searchsorted). The range is consumed in windows of
     `window` points aligned to window boundaries, DMA'd HBM->VMEM.
  3. Within a window (all lane-oriented, points on lanes): Hillis-
     Steele **segmented max-scan AND sum-scan** along the point axis
     leave every cell's window-reduction at its last point; a one-hot
     (slab x window) routing matrix moves those segment results to
     slab rows with ONE MXU matmul — data-dependent routing at matmul
     speed instead of scatter speed.

Channel convention (static `num_max` splits the C channels; C is a
sublane-multiple parameter 8..128 — DMA/scan/table cost scales with C,
so carry only the channels you use): channels [0, num_max) are
max-reduced per cell (init -3e38), channels [num_max, C) are
sum-reduced (init 0). One sum channel must be an all-ones "count"
channel, named by `count_channel`: the kernel uses
routed-count > 0 to tell real segment-ends from empty routing rows
(cells spanning a window boundary combine correctly: maxes by max,
partial sums by addition).

Precision: routing runs as two bf16 matmuls on a hi+lo split of the
f32 scan results (the one-hot matmul is a selection, so each half is
exact); the recombined value carries <= ~2^-18 relative error (~4e-6).
Integer-valued channels (counts, +1-shifted coords) survive rounding
exactly for magnitudes < ~2^17.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -3.0e38  # effectively -inf, stays finite on the VPU
LANES = 128


def _paint_kernel(offs_ref, vals_hbm, cell_hbm, out_ref,
                  vals_s, cell_s, sems,
                  *, slab: int, window: int, num_max: int,
                  count_channel: int, exact: bool, chans: int):
    b = pl.program_id(0)
    s = pl.program_id(1)
    lo = offs_ref[b, s]
    hi = offs_ref[b, s + 1]
    base = s * slab
    w = window

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)         # points
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (slab, chans), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (slab, w), 0)
    is_max_lane = out_lane < num_max

    out_ref[0] = jnp.where(is_max_lane, _NEG, 0.0)

    nwin = jnp.where(hi > lo, (hi - 1) // w - lo // w + 1, 0)

    def copies(wi, slot):
        start = (lo // w + wi) * w
        return (
            pltpu.make_async_copy(
                vals_hbm.at[b, :, pl.ds(start, w)],
                vals_s.at[slot], sems.at[slot, 0]),
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
        # Double buffer: prefetch window wi+1 while computing wi.
        @pl.when(wi + 1 < nwin)
        def _():
            for cp in copies(wi + 1, 1 - slot):
                cp.start()
        for cp in copies(wi, slot):
            cp.wait()

        # Window-aligned blocks may carry neighbor-slab points; the
        # cell-range test routes only this slab's cells (sentinel=slab).
        cell = cell_s[slot]                               # (1, w)
        inrange = (cell >= base) & (cell < base + slab)
        local = jnp.where(inrange, cell - base, slab)

        # Segment geometry along the (sorted) point/lane axis.
        prev = pltpu.roll(local, shift=1, axis=1)
        is_start = (local != prev) | (lane == 0)
        startpos = jnp.where(is_start, lane, -1)
        seg_start = startpos
        sh = 1
        while sh < w:
            rolled = pltpu.roll(seg_start, shift=sh, axis=1)
            rolled = jnp.where(lane >= sh, rolled, -1)
            seg_start = jnp.maximum(seg_start, rolled)
            sh *= 2
        dist = lane - seg_start                           # (1, w)

        # Segmented scans over all channel-sublanes; lane-select merges
        # the max-lane and sum-lane results (no lane slicing). Pure-sum
        # (num_max == 0, the voxelize spread) and pure-max callers skip
        # the unused scan entirely — it is half the per-window VPU work.
        v = vals_s[slot]                                  # (128, w) f32
        vmax = v
        vsum = v
        sh = 1
        while sh < w:
            ok = dist >= sh                               # (1, w)
            if num_max > 0:
                rm = pltpu.roll(vmax, shift=sh, axis=1)
                rm = jnp.where(lane >= sh, rm, _NEG)
                vmax = jnp.where(ok, jnp.maximum(vmax, rm), vmax)
            if num_max < chans:
                rs = pltpu.roll(vsum, shift=sh, axis=1)
                rs = jnp.where(lane >= sh, rs, 0.0)
                vsum = jnp.where(ok, vsum + rs, vsum)
            sh *= 2
        if num_max == 0:
            scanned = vsum
        elif num_max == chans:
            scanned = vmax
        else:
            ch = jax.lax.broadcasted_iota(jnp.int32, (chans, w), 0)
            scanned = jnp.where(ch < num_max, vmax, vsum)  # (chans, w)

        # Route each cell's segment-end to its slab row. The one-hot
        # matmul is a pure SELECTION, so splitting the f32 operand into
        # bf16 hi + lo halves and routing each is exact while running
        # the MXU at bf16 speed (~4x f32).
        nxt = pltpu.roll(local, shift=w - 1, axis=1)      # circular -1
        is_end = (local != nxt) | (lane == w - 1)
        r_end = ((rows == local) & is_end).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))

        def route(v):
            return jax.lax.dot_general(
                r_end, v, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        s_hi = scanned.astype(jnp.bfloat16)
        r1 = scanned - s_hi.astype(jnp.float32)
        s_mid = r1.astype(jnp.bfloat16)
        routed = route(s_hi) + route(s_mid)               # (slab, 128)
        if exact:
            # Third split term: bf16 x3 carries all 24 f32 mantissa
            # bits, making the selection bit-exact (needed by the
            # segment-max VJP's argmax-equality indicator).
            s_lo = (r1 - s_mid.astype(jnp.float32)).astype(jnp.bfloat16)
            routed = routed + route(s_lo)

        cnt = jnp.sum(
            jnp.where(out_lane == count_channel, routed, 0.0),
            axis=1, keepdims=True)                        # (slab, 1)
        has = cnt > 0.0
        acc = out_ref[0]
        new_max = jnp.where(has, jnp.maximum(acc, routed), acc)
        out_ref[0] = jnp.where(is_max_lane, new_max, acc + routed)
        return 0

    jax.lax.fori_loop(0, nwin, body, 0)


@partial(jax.jit, static_argnames=("num_cells", "num_max",
                                   "count_channel", "slab", "window",
                                   "interpret", "exact"))
def segment_paint(
    vals: jax.Array,           # (B, N, C) f32, sorted by cell
    cell_sorted: jax.Array,    # (B, N) int32 ascending; invalid >= num_cells
    *,
    num_cells: int,
    num_max: int,
    count_channel: int,
    slab: int = 512,
    window: int = 512,
    interpret: bool = False,
    exact: bool = False,       # bf16 x3 routing: bit-exact selection
) -> jax.Array:
    """Dense per-cell reduction table (B, num_cells, C) f32.

    Channels [0, num_max): per-cell max (-3e38 where empty);
    channels [num_max, C): per-cell sum (0 where empty). Channel
    `count_channel` (>= num_max) must be 1.0 on every point.
    """
    b, n, c = vals.shape
    # Channel width is a parameter (8 <= C <= 128, sublane multiple):
    # many callers carry only a handful of useful channels (the train
    # encoder's stats paint uses 4 of 128), and the window DMA + scan
    # VPU work + table HBM writes all scale with C (the one-hot routing
    # matmul does not — its output tile is lane-padded either way).
    assert c % 8 == 0 and 8 <= c <= LANES, \
        f"vals channels must be a multiple of 8 in [8, {LANES}], got {c}"
    assert num_max <= count_channel < c
    if n % window:
        # Pad the point axis to a window multiple: zero rows with the
        # max-cell sentinel keep the stream sorted and route nowhere.
        pad = window - n % window
        vals = jnp.concatenate(
            [vals, jnp.zeros((b, pad, c), vals.dtype)], axis=1)
        cell_sorted = jnp.concatenate(
            [cell_sorted,
             jnp.full((b, pad), num_cells, cell_sorted.dtype)], axis=1)
        n += pad
    num_slabs = -(-num_cells // slab)
    padded_cells = num_slabs * slab

    bounds = jnp.arange(num_slabs + 1, dtype=jnp.int32) * slab
    offsets = jax.vmap(
        lambda cc: jnp.searchsorted(cc, bounds, side="left"))(cell_sorted)
    offsets = offsets.astype(jnp.int32)                   # (B, S+1)

    vals_t = vals.astype(jnp.float32).transpose(0, 2, 1)  # (B, 128, N)
    cell_l = cell_sorted[:, None, :]                      # (B, 1, N)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_slabs),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),         # vals (B,128,N)
            pl.BlockSpec(memory_space=pl.ANY),         # cell (B,1,N)
        ],
        out_specs=pl.BlockSpec(
            (1, slab, c), lambda b_, s_, offs: (b_, s_, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, c, window), jnp.float32),      # double buffer
            pltpu.VMEM((2, 1, window), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        partial(_paint_kernel, slab=slab, window=window,
                num_max=num_max, count_channel=count_channel,
                exact=exact, chans=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, padded_cells, c), jnp.float32),
        interpret=interpret,
    )(offsets, vals_t, cell_l)
    return out[:, :num_cells]

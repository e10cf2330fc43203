"""Pallas slab-unpaint kernel: dense per-cell table -> sorted points.

The inverse of ops/pallas/pillar_paint.py's slab paint: given a table
(B, R, 128) and an ascending cell stream (B, N), produce per-point rows
``out[b, i] = table[b, cell[b, i]]`` (0 where ``cell >= R``). This is a
data-dependent GATHER, which XLA:TPU executes at ~2 GB/s regardless of
hints (benchmarks/profile_scatter.py); here it runs as one-hot
TRANSPOSE matmuls on the MXU instead — routing table slabs resident in
VMEM to point windows at matmul speed.

Used as the backward engine of the differentiable train-path encoder
(segment-max VJP needs ``canvas[cell]``/``g[cell]`` per point, and the
PFN decoration needs ``mean[cell]`` per point — see
models/pillar_encoder.py).

Design notes:
  * Grid = (batch, slab); each slab program consumes its own point
    range [offs[b,s], offs[b,s+1]) in windows starting at the range
    start rounded DOWN to a 128-lane boundary (Mosaic DMA alignment),
    and writes (window, 128) chunks to the output with manual DMA.
    Chunks overrun into neighbouring ranges with zeros; TPU grid steps
    execute sequentially on the core, so later slabs overwrite forward
    overruns with correct values, and the <=127 leading rows each
    program zeroes at its aligned-down start are restored by an XLA
    gather patch in the wrapper (idempotent: table[cell[p]] is correct
    for any row regardless of which program owned it).
  * Precision: the one-hot matmul is a pure selection, so routing a
    bf16 hi+lo split of the f32 table is exact.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _unpaint_kernel(offs_ref, cell_hbm, tab_ref, out_hbm,
                    cell_s, out_s, sems, *, slab: int, window: int,
                    exact: bool, chans: int):
    b = pl.program_id(0)
    s = pl.program_id(1)
    # DMA offsets must be provably 128-lane aligned on TPU (Mosaic
    # "tile index divisible by the tiling" check), so each range starts
    # at its offset rounded DOWN to a lane boundary. The <=127 leading
    # rows belong to earlier slabs; this program writes them as zeros
    # and the wrapper's XLA boundary patch restores them (see
    # segment_unpaint).
    lo0 = offs_ref[b, s]
    lo = (lo0 // LANES) * LANES
    hi = offs_ref[b, s + 1]
    base = s * slab
    w = window

    rows_w = jax.lax.broadcasted_iota(jnp.int32, (slab, w), 0)
    nwin = jnp.where(hi > lo0, (hi - lo - 1) // w + 1, 0)

    tab = tab_ref[0]                                       # (slab, 128)
    t_hi = tab.astype(jnp.bfloat16)
    r1 = tab - t_hi.astype(jnp.float32)
    t_mid = r1.astype(jnp.bfloat16)
    t_lo = (r1 - t_mid.astype(jnp.float32)).astype(jnp.bfloat16)

    def in_copy(wi, slot):
        start = pl.multiple_of(lo + wi * w, LANES)
        return pltpu.make_async_copy(
            cell_hbm.at[b, :, pl.ds(start, w)],
            cell_s.at[slot], sems.at[slot, 0])

    def out_copy(wi, slot):
        start = pl.multiple_of(lo + wi * w, LANES)
        return pltpu.make_async_copy(
            out_s.at[slot],
            out_hbm.at[b, pl.ds(start, w), :],
            sems.at[slot, 1])

    @pl.when(nwin > 0)
    def _():
        in_copy(0, 0).start()

    def body(wi, _):
        slot = jax.lax.rem(wi, 2)
        @pl.when(wi + 1 < nwin)
        def _():
            in_copy(wi + 1, 1 - slot).start()
        in_copy(wi, slot).wait()
        # Wait for this slot's previous out-DMA before overwriting.
        @pl.when(wi >= 2)
        def _():
            out_copy(wi - 2, slot).wait()

        cell = cell_s[slot]                                # (1, w)
        inrange = (cell >= base) & (cell < base + slab)
        local = jnp.where(inrange, cell - base, slab)
        onehot = (rows_w == local).astype(jnp.bfloat16)    # (slab, w)

        dn = (((0,), (0,)), ((), ()))                      # contract slab

        def route(v):
            return jax.lax.dot_general(
                onehot, v, dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        out = route(t_hi) + route(t_mid)                   # (w, 128)
        if exact:
            # bf16 x3 split carries all 24 f32 mantissa bits — the
            # selection becomes bit-exact (segment-max VJP needs it).
            out = out + route(t_lo)
        out_s[slot] = out
        out_copy(wi, slot).start()
        return 0

    jax.lax.fori_loop(0, nwin, body, 0)

    # Drain outstanding out-DMAs: later grid steps may overwrite the
    # overrun region, so every write must land before this step ends.
    @pl.when(nwin > 0)
    def _():
        out_copy(nwin - 1, jax.lax.rem(nwin - 1, 2)).wait()
    @pl.when(nwin > 1)
    def _():
        out_copy(nwin - 2, jax.lax.rem(nwin - 2, 2)).wait()


@partial(jax.jit, static_argnames=("num_rows", "slab", "window",
                                   "interpret", "exact"))
def segment_unpaint(
    table: jax.Array,          # (B, R, C) f32, C a sublane multiple
    cell_sorted: jax.Array,    # (B, N) int32 ascending; invalid >= R
    *,
    num_rows: int,
    slab: int = 512,
    window: int = 512,
    interpret: bool = False,
    exact: bool = False,       # bf16 x3 routing: bit-exact selection
) -> jax.Array:
    """Per-point table rows (B, N, C) f32: out[i] = table[cell[i]].

    Rows whose cell is >= num_rows come back 0 (the last slab's range
    is extended over the invalid-sentinel tail so every output row is
    written; out-of-range cells route a zero one-hot).
    """
    b, r, c = table.shape
    assert c % 8 == 0 and 8 <= c <= LANES, \
        f"table channels must be a multiple of 8 in [8, {LANES}], got {c}"
    # Unlike the paint kernel (channels on SUBLANES), the unpaint's
    # per-point output rows put channels on the LANE dim, and Mosaic
    # cannot DMA-slice a <128-lane window out of a 128-lane tile
    # (measured round 4: chans=64 fails to compile). Pad the table to
    # the full lane tile and slice the result — the narrow-width API
    # stands, the kernel always runs 128 lanes.
    c_in = c
    if c < LANES:
        table = jnp.concatenate(
            [table, jnp.zeros((b, r, LANES - c), table.dtype)], axis=-1)
        c = LANES
    n = cell_sorted.shape[1]
    num_slabs = -(-r // slab)
    padded_rows = num_slabs * slab
    if padded_rows != r:
        table = jnp.concatenate(
            [table, jnp.zeros((b, padded_rows - r, c), table.dtype)],
            axis=1)
    npad = n
    if n % window:
        pad = window - n % window
        cell_sorted = jnp.concatenate(
            [cell_sorted,
             jnp.full((b, pad), padded_rows, cell_sorted.dtype)], axis=1)
        npad = n + pad
    # One extra window of slack so unaligned final chunks can overrun.
    cell_sorted = jnp.concatenate(
        [cell_sorted,
         jnp.full((b, window), padded_rows, cell_sorted.dtype)], axis=1)

    # Last bound is +inf so the invalid-sentinel tail still gets its
    # output rows WRITTEN (with zeros — unwritten HBM is garbage).
    bounds = jnp.arange(num_slabs + 1, dtype=jnp.int32) * slab
    bounds = bounds.at[-1].set(jnp.iinfo(jnp.int32).max)
    offsets = jax.vmap(
        lambda cc: jnp.searchsorted(cc[:npad], bounds, side="left"))(
            cell_sorted).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_slabs),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # cell (B,1,N')
            pl.BlockSpec((1, slab, c),
                         lambda b_, s_, offs: (b_, s_, 0)),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),       # manual DMA
        scratch_shapes=[
            pltpu.VMEM((2, 1, window), jnp.int32),
            pltpu.VMEM((2, window, c), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    table = table.astype(jnp.float32)
    out = pl.pallas_call(
        partial(_unpaint_kernel, slab=slab, window=window, exact=exact,
                chans=c),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b, npad + window, c), jnp.float32),
        interpret=interpret,
    )(offsets, cell_sorted[:, None, :], table)

    # XLA boundary patch: the kernel's ranges start at their offset
    # rounded DOWN to a 128-lane boundary (Mosaic DMA alignment), so
    # the <=127 rows in [align128(lo_t), lo_t) at every slab start are
    # last-written as ZEROS by a program that masks their cells out of
    # its slab. Restore them with a direct gather — table[cell[p]] is
    # the correct value for ANY row, so the patch is idempotent and
    # needs no ownership logic. Cost: <=128*num_slabs gathered rows
    # per batch element.
    lo_t = offsets[:, :num_slabs]                            # (B, S)
    lo_a = (lo_t // LANES) * LANES
    pos = lo_a[:, :, None] + jnp.arange(LANES, dtype=jnp.int32)
    valid = (pos < lo_t[:, :, None]).reshape(b, -1)
    posf = pos.reshape(b, -1)                                # (B, S*128)
    cells = jnp.take_along_axis(
        cell_sorted, jnp.minimum(posf, npad + window - 1), axis=1)
    cells = jnp.minimum(cells, padded_rows - 1)
    rows = jnp.take_along_axis(table, cells[:, :, None], axis=1)
    if not exact:
        # The kernel's non-exact path returns the 2-pass (hi+mid)
        # reconstruction; patched rows must match it bit-for-bit, or a
        # caller comparing outputs against its own 2-pass decomposition
        # (segment-max argmax indicator) silently drops boundary rows.
        r_hi = rows.astype(jnp.bfloat16).astype(jnp.float32)
        rows = r_hi + (rows - r_hi).astype(jnp.bfloat16).astype(
            jnp.float32)
    tgt = jnp.where(valid, posf, npad + window)              # drop slot
    out = out.at[jnp.arange(b)[:, None], tgt].set(rows, mode="drop")
    return out[:, :n, :c_in]

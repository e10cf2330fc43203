"""Pallas K-reduction spread kernel: per-offset value streams -> one
accumulated dense table.

The round-3 engine of the SECOND sparse conv (SURVEY.md §2.3 O8) and of
every monotone-unique-target spread. The round-2 formulation routed
each of the K=27 offset streams through the generic slab-paint kernel
into its OWN (V_out, 128) f32 table and summed over K in XLA — ~6 GB of
HBM traffic per conv (docs/ROUND3_NOTES.md), because the streams were
padded to 128 f32 lanes and the K tables were materialized twice.

This kernel exploits two structural facts:

  * For a fixed kernel offset the in->out cell map is MONOTONE and
    UNIQUE, so a stream needs no segmented scan at all — every element
    routes straight to its own output row with a one-hot MXU matmul
    (data-dependent placement at matmul speed, the paint-kernel trick
    minus the scan).
  * All K offsets accumulate into the SAME output table, so K is a
    reduction: grid = (batch, slab, K) with K innermost — the output
    block stays resident in VMEM across all K streams and is written
    to HBM once. No per-offset tables, no XLA sum pass.

Streams carry native C<=128 lanes in their own dtype (bf16 streams
halve traffic and route exactly — the one-hot matmul is a selection;
f32 streams use the hi+mid bf16 split, ~2^-17 relative like the paint
kernel).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _spread_kernel(offs_ref, vals_hbm, tgt_hbm, out_ref,
                   vals_s, tgt_s, sems, *, slab: int, window: int,
                   c: int, num_k: int, f32_stream: bool):
    b = pl.program_id(0)
    s = pl.program_id(1)
    k = pl.program_id(2)
    # DMA offsets must be provably 128-lane aligned on TPU (Mosaic
    # "tile index divisible by the tiling" check): round the range
    # start DOWN to a lane boundary. The <=127 leading points belong
    # to earlier slabs and are masked by `inrange` below (tgt < base);
    # accumulation means nothing else is needed.
    lo0 = offs_ref[b, k, s]
    lo = (lo0 // LANES) * LANES
    hi = offs_ref[b, k, s + 1]
    base = s * slab
    w = window

    rows_w = jax.lax.broadcasted_iota(jnp.int32, (slab, w), 0)

    @pl.when(k == 0)
    def _():
        out_ref[0] = jnp.zeros((slab, c), jnp.float32)

    nwin = jnp.where(hi > lo0, (hi - lo - 1) // w + 1, 0)

    def copies(wi, slot):
        start = pl.multiple_of(lo + wi * w, LANES)
        return (
            pltpu.make_async_copy(
                vals_hbm.at[b, k, :, pl.ds(start, w)],
                vals_s.at[slot], sems.at[slot, 0]),
            pltpu.make_async_copy(
                tgt_hbm.at[b, k, :, pl.ds(start, w)],
                tgt_s.at[slot], sems.at[slot, 1]),
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

        tgt = tgt_s[slot]                                  # (1, w)
        v = vals_s[slot]                                   # (C, w)
        inrange = (tgt >= base) & (tgt < base + slab)
        local = jnp.where(inrange, tgt - base, slab)
        onehot = (rows_w == local).astype(jnp.bfloat16)    # (slab, w)
        dn = (((1,), (1,)), ((), ()))

        def route(x):
            return jax.lax.dot_general(
                onehot, x, dimension_numbers=dn,
                preferred_element_type=jnp.float32)

        if f32_stream:
            v_hi = v.astype(jnp.bfloat16)
            v_mid = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            routed = route(v_hi) + route(v_mid)
        else:
            routed = route(v)                              # (slab, C)
        out_ref[0] = out_ref[0] + routed
        return 0

    jax.lax.fori_loop(0, nwin, body, 0)


@partial(jax.jit, static_argnames=("num_out", "slab", "window",
                                   "interpret"))
def spread_accumulate(
    vals: jax.Array,       # (B, K, C, N) f32 or bf16, invalid cols = 0
    targets: jax.Array,    # (B, K, N) int32 ascending per (b, k) row
    *,
    num_out: int,
    slab: int = 1024,
    window: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """Σ_k scatter(vals[:, k] -> targets[:, k]) as (B, num_out, C) f32.

    Per (b, k) row the targets must be ascending with each output row
    hit at most once (monotone unique maps — sparse-conv offsets,
    inverse maps, compacted streams); collisions ACROSS k accumulate.
    Targets >= num_out are dropped (point them at num_out and zero the
    values, keeping the stream ascending).
    """
    b, num_k, c, n = vals.shape
    num_slabs = -(-num_out // slab)
    padded = num_slabs * slab
    # Pad the stream to a window multiple plus one window of slack so
    # unaligned final windows can overrun harmlessly.
    pad = (window - n % window) % window + window
    vals = jnp.concatenate(
        [vals, jnp.zeros((b, num_k, c, pad), vals.dtype)], axis=-1)
    targets = jnp.concatenate(
        [targets, jnp.full((b, num_k, pad), padded, targets.dtype)],
        axis=-1)

    bounds = jnp.arange(num_slabs + 1, dtype=jnp.int32) * slab
    offsets = jax.vmap(jax.vmap(
        lambda tt: jnp.searchsorted(tt[:n], bounds, side="left")))(
            targets).astype(jnp.int32)                     # (B, K, S+1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, num_slabs, num_k),                        # K innermost
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # vals
            pl.BlockSpec(memory_space=pl.ANY),             # targets
        ],
        out_specs=pl.BlockSpec(
            (1, slab, c), lambda b_, s_, k_, offs: (b_, s_, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, c, window), vals.dtype),        # double buffer
            pltpu.VMEM((2, 1, window), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        partial(_spread_kernel, slab=slab, window=window, c=c,
                num_k=num_k, f32_stream=vals.dtype == jnp.float32),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, padded, c), jnp.float32),
        interpret=interpret,
    )(offsets, vals, targets[:, :, None, :])
    return out[:, :num_out]

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
    reduction: grid = (batch, slab) with an in-kernel K loop — the
    output block stays resident in VMEM across all K streams and is
    written to HBM once. No per-offset tables, no XLA sum pass.

Streams carry native C<=128 lanes in their own dtype (bf16 streams
halve traffic and route exactly — the one-hot matmul is a selection;
f32 streams use the hi+mid bf16 split, ~2^-17 relative like the paint
kernel).

**Ring-scheduled DMA (round 3b).** A (k, slab) range holds only ~1-2
windows, so per-window double buffering inside one range has no depth
to hide the ~2-3 us HBM latency — with B*slabs*K grid programs the
kernel was latency-bound, not MAC-bound (SECOND measured ~20 ms/conv).
Windows are therefore prefetched through a DEPTH-deep ring that spans
range/program boundaries: XLA precomputes the flat execution order of
every window (sched = [src b, k, aligned start] per global window
index, cumw = first global index per (b, k, s) range), the first
program pre-issues DEPTH windows, and each processed window issues
window g+DEPTH. Grid steps execute in order and scratch persists
across them, so window g's copy always lands before window g is
consumed, and slot g%RING was consumed R-D windows earlier.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
RING = 8          # window buffers in the ring
DEPTH = 5         # windows issued ahead of consumption (< RING)


def _spread_kernel(offs_ref, cumw_ref, sched_ref, vals_hbm, tgt_hbm,
                   out_ref, vals_s, tgt_s, sems, *, slab: int,
                   window: int, c: int, num_k: int, f32_stream: bool):
    b = pl.program_id(0)
    s = pl.program_id(1)
    base = s * slab
    w = window
    total = cumw_ref[0, 0, 0]         # row 0 repurposed: total windows
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (slab, w), 0)

    def issue(g):
        # Start window g's copies into ring slot g % RING, reading its
        # (source batch, offset row, aligned start) from the schedule.
        slot = jax.lax.rem(g, RING)
        gb = sched_ref[0, g]
        gk = sched_ref[1, g]
        start = pl.multiple_of(sched_ref[2, g], LANES)
        pltpu.make_async_copy(
            vals_hbm.at[gb, gk, :, pl.ds(start, w)],
            vals_s.at[slot], sems.at[slot, 0]).start()
        pltpu.make_async_copy(
            tgt_hbm.at[gb, gk, :, pl.ds(start, w)],
            tgt_s.at[slot], sems.at[slot, 1]).start()

    @pl.when((b == 0) & (s == 0))
    def _():
        for d in range(DEPTH):
            @pl.when(d < total)
            def _():
                issue(jnp.int32(d))

    out_ref[0] = jnp.zeros((slab, c), jnp.float32)

    def k_body(k, _):
        lo0 = offs_ref[b, k, s]
        lo = (lo0 // LANES) * LANES
        hi = offs_ref[b, k, s + 1]
        nwin = jnp.where(hi > lo0, (hi - lo - 1) // w + 1, 0)
        g0 = cumw_ref[1 + b, k, s]

        def body(wi, _):
            g = g0 + wi
            slot = jax.lax.rem(g, RING)
            start = pl.multiple_of(lo + wi * w, LANES)
            # Wait on the copies issued DEPTH windows ago (same
            # descriptors: sched[g] == (b, k, start) for our windows).
            pltpu.make_async_copy(
                vals_hbm.at[b, k, :, pl.ds(start, w)],
                vals_s.at[slot], sems.at[slot, 0]).wait()
            pltpu.make_async_copy(
                tgt_hbm.at[b, k, :, pl.ds(start, w)],
                tgt_s.at[slot], sems.at[slot, 1]).wait()
            @pl.when(g + DEPTH < total)
            def _():
                issue(g + DEPTH)

            tgt = tgt_s[slot]                              # (1, w)
            v = vals_s[slot]                               # (C, w)
            inrange = (tgt >= base) & (tgt < base + slab)
            local = jnp.where(inrange, tgt - base, slab)
            onehot = (rows_w == local).astype(jnp.bfloat16)  # (slab, w)
            dn = (((1,), (1,)), ((), ()))

            def route(x):
                return jax.lax.dot_general(
                    onehot, x, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)

            if f32_stream:
                v_hi = v.astype(jnp.bfloat16)
                v_mid = (v - v_hi.astype(jnp.float32)).astype(
                    jnp.bfloat16)
                routed = route(v_hi) + route(v_mid)
            else:
                routed = route(v)                          # (slab, C)
            out_ref[0] = out_ref[0] + routed
            return 0

        jax.lax.fori_loop(0, nwin, body, 0)
        return 0

    jax.lax.fori_loop(0, num_k, k_body, 0)


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

    # Flat window schedule in grid execution order (b, s, k, wi): the
    # kernel's cross-program DMA ring walks it (see module docstring).
    lo0 = offsets[:, :, :-1]
    lo = (lo0 // LANES) * LANES
    hi = offsets[:, :, 1:]
    nwin = jnp.where(hi > lo0, (hi - lo - 1) // window + 1, 0)  # (B,K,S)
    order = nwin.transpose(0, 2, 1)                        # (B, S, K)
    cum = (jnp.cumsum(order.reshape(-1)) - order.reshape(-1)).reshape(
        order.shape).transpose(0, 2, 1).astype(jnp.int32)  # (B, K, S)
    total = jnp.sum(nwin).astype(jnp.int32)
    # cumw row 0 carries the total; rows 1..B the per-range firsts.
    cumw = jnp.concatenate(
        [jnp.broadcast_to(total, (1,) + cum.shape[1:]), cum], axis=0)

    maxwin = n // window + 2
    # Per (b, k) row: sum_s nwin <= n/window + 2*S (each range adds at
    # most one partial window plus up to 127 aligned-down lead points).
    tmax = b * num_k * (n // window + 2 * num_slabs + 2)
    wi = jnp.arange(maxwin, dtype=jnp.int32)
    pos = cum[..., None] + wi                              # (B,K,S,MW)
    pos = jnp.where(wi < nwin[..., None], pos, tmax)
    bi = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None, None, None], pos.shape)
    ki = jnp.broadcast_to(
        jnp.arange(num_k, dtype=jnp.int32)[None, :, None, None],
        pos.shape)
    st = lo[..., None] + wi * window
    sched = jnp.zeros((3, tmax + 1), jnp.int32)
    flat = pos.reshape(-1)
    sched = sched.at[0, flat].set(bi.reshape(-1), mode="drop")
    sched = sched.at[1, flat].set(ki.reshape(-1), mode="drop")
    sched = sched.at[2, flat].set(st.reshape(-1), mode="drop")
    sched = sched[:, :tmax]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, num_slabs),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),             # vals
            pl.BlockSpec(memory_space=pl.ANY),             # targets
        ],
        out_specs=pl.BlockSpec(
            (1, slab, c), lambda b_, s_, offs, cw, sc: (b_, s_, 0)),
        scratch_shapes=[
            pltpu.VMEM((RING, c, window), vals.dtype),     # DMA ring
            pltpu.VMEM((RING, 1, window), jnp.int32),
            pltpu.SemaphoreType.DMA((RING, 2)),
        ],
    )
    out = pl.pallas_call(
        partial(_spread_kernel, slab=slab, window=window, c=c,
                num_k=num_k, f32_stream=vals.dtype == jnp.float32),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, padded, c), jnp.float32),
        interpret=interpret,
    )(offsets, cumw, sched, vals, targets[:, :, None, :])
    return out[:, :num_out]

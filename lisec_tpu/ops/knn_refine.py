"""O13 — range-window kNN label refinement (SURVEY.md §2.3 O13).

Reference form: CUDA windowed kNN vote (RangeNet++-style post-process).

Round-2 TPU-native design (the round-1 per-point windowed gather —
(N, S²) scalar gathers from the range/label images plus per-point vote
scatters — measured 1271 of the range pipeline's 1263 ms/batch-8; all
data-dependent movement sits on the ~2 GB/s ceiling):

  1. The S² pixel neighborhoods are built IMAGE-SPACE as shifted
     copies (edge-clamped pad+slice — pure dense copies), packed into a
     (2*S², H*W) COLUMN table: [S² ranges | S² labels].
  2. Points co-sort by pixel id (multi-operand `lax.sort`, ~free).
  3. Each OCCUPIED pixel's table row is delivered to its FIRST point
     via the monotone unique-target spread (the same Pallas slab-paint
     machinery as the sparse conv), then forward-filled down each
     pixel's point segment with a bounded segmented max-scan (all
     channels are non-negative). Points deeper than ``fill_depth`` in
     one pixel fall back to the projected label — the pre-refinement
     behavior — rather than paying an unbounded scan.
  4. The k-NN select and class vote run in flat (N, S²) layout with
     one-hot arithmetic — no vote scatters.

Round-5 layout rework (the composed-vs-isolated gap profile,
benchmarks/profile_rangeseg.py --gap, measured ~22 ms/batch-8 of
composition overhead that the isolated stage timings hid by hoisting
label/pixel-dependent subtrees): every intermediate with a small minor
dim ((B, H, W, S²) shifted stacks, (B, N, 2) pixel uv) tile-pads its
last dim to 128 lanes on TPU. The neighborhood table is therefore
built CHANNEL-LEADING ((B, 2*S², H*W): channels on sublanes, pixels on
dense 128-lane tiles), the spread consumes it column-wise, callers
pass precomputed FLAT pixel ids (B, N) instead of (B, N, 2) uv, and
the projected-label fallback gathers with the already-sorted pixel
stream instead of re-sorting.

Static shapes throughout; runs inside the jitted inference program so
per-POINT labels leave the device (SURVEY.md §3.5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _shifted_stack_cols(img, half, fill):
    """(B, H, W) -> (B, S², H, W) edge-padded shifted copies, stacked
    on a LEADING channel axis (each copy is a compact (B, H, W) slice;
    stacking them on the minor axis would tile-pad S² -> 128 lanes)."""
    b, h, w = img.shape
    padded = jnp.pad(img, ((0, 0), (half, half), (half, half)),
                     mode="constant", constant_values=fill)
    outs = []
    for dv in range(-half, half + 1):
        for du in range(-half, half + 1):
            outs.append(jax.lax.dynamic_slice(
                padded, (0, half + dv, half + du), (b, h, w)))
    return jnp.stack(outs, axis=1)


def _build_table_cols(image_range, image_labels, image_mask, half, s2):
    """(B, 2*S², HW) column table: [S² ranges | S² label+1]."""
    b, h, w = image_range.shape
    nbr_r = _shifted_stack_cols(image_range, half, 0.0)
    lbl_enc = jnp.where(image_mask,
                        image_labels.astype(jnp.float32) + 1.0, 0.0)
    nbr_l = _shifted_stack_cols(lbl_enc, half, 0.0)
    return jnp.concatenate([nbr_r, nbr_l], axis=1).reshape(
        b, 2 * s2, h * w)


def _deliver_rows(table_cols, pix_s, hw, n, interpret):
    """Deliver each occupied pixel's table row to its FIRST point (in
    pixel-sorted point order) via tag-merge + monotone spread."""
    from lisec_tpu.ops.sparse_conv import _monotone_spread_cols

    b = table_cols.shape[0]
    cells = jnp.concatenate(
        [jnp.broadcast_to(jnp.arange(hw, dtype=jnp.int32)[None], (b, hw)),
         pix_s], axis=1)
    tag = jnp.concatenate(
        [jnp.zeros((b, hw), jnp.int32), jnp.ones((b, n), jnp.int32)],
        axis=1)
    pos = jnp.concatenate(
        [jnp.arange(hw, dtype=jnp.int32)[None].repeat(b, 0),
         jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))],
        axis=1)
    c_s, t_s, p_s = jax.lax.sort((cells, tag, pos), dimension=1,
                                 num_keys=2)
    nxt_c = jnp.concatenate(
        [c_s[:, 1:], jnp.full((b, 1), -1, c_s.dtype)], axis=1)
    nxt_t = jnp.concatenate(
        [t_s[:, 1:], jnp.zeros((b, 1), t_s.dtype)], axis=1)
    nxt_p = jnp.concatenate(
        [p_s[:, 1:], jnp.zeros((b, 1), p_s.dtype)], axis=1)
    # For a tag-0 (table) row: the next sorted entry is its pixel's
    # first point iff same cell and tag 1.
    row_target = jnp.where(
        (t_s == 0) & (nxt_t == 1) & (nxt_c == c_s), nxt_p, -1)
    # Compact the tag-0 rows back to row-id order.
    key = jnp.where(t_s == 0, c_s, hw + n)
    _, tgt = jax.lax.sort((key, row_target), dimension=1, num_keys=1)
    tgt = tgt[:, :hw]                                   # (B, HW)
    return _monotone_spread_cols(table_cols, tgt, tgt >= 0, n, interpret)


def _forward_fill(first_rows, pix_s, fill_depth):
    """Bounded segmented forward fill (channels are all >= 0)."""
    b, n = pix_s.shape
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, pix_s.dtype), pix_s[:, :-1]], axis=1)
    is_start = pix_s != prev
    posn = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, posn, -1), axis=1)
    dist = posn - seg_start
    filled = first_rows
    c_tab = first_rows.shape[-1]
    sh = 1
    while sh < fill_depth:
        rolled = jnp.concatenate(
            [jnp.zeros((b, sh, c_tab), filled.dtype), filled[:, :-sh]],
            axis=1)
        filled = jnp.where((dist >= sh)[..., None],
                           jnp.maximum(filled, rolled), filled)
        sh *= 2
    return filled


def _vote(filled, range_s, s2, k, num_classes, cutoff):
    """Flat k-NN select + class vote. Returns (refined, has_vote)."""
    nr = filled[..., :s2]
    nle = filled[..., s2:2 * s2]                        # 0 or label+1
    nl = jnp.maximum(nle - 1.0, 0.0)
    dr = jnp.abs(nr - range_s[..., None])
    big = jnp.array(3.0e38, dr.dtype)
    dr = jnp.where((nle > 0.5) & (dr < cutoff), dr, big)
    neg_d, sel = jax.lax.top_k(-dr, k)                  # (B, N, k)
    d = -neg_d
    wgt = jnp.where(d < big, 1.0 / (d + 1e-3), 0.0)
    sel_onehot = jax.nn.one_hot(sel, s2, dtype=jnp.float32)
    lbl = jnp.einsum("bnks,bns->bnk", sel_onehot, nl)
    votes = jnp.sum(
        jax.nn.one_hot(jnp.round(lbl).astype(jnp.int32), num_classes,
                       dtype=jnp.float32) * wgt[..., None], axis=2)
    refined = jnp.argmax(votes, axis=-1).astype(jnp.int32)
    has_vote = jnp.sum(wgt, axis=-1) > 0
    return refined, has_vote


@partial(jax.jit, static_argnames=("window", "k", "num_classes",
                                   "fill_depth", "interpret"))
def knn_refine_batch(
    point_range: jax.Array,    # (B, N)
    pixel_pix: jax.Array,      # (B, N) int32 flat pixel id v*W + u
    image_range: jax.Array,    # (B, H, W)
    image_labels: jax.Array,   # (B, H, W) int32
    image_mask: jax.Array,     # (B, H, W) bool
    *,
    window: int = 5,
    k: int = 5,
    num_classes: int = 20,
    cutoff: float = 1.0,
    fill_depth: int = 32,
    interpret: bool | None = None,
) -> jax.Array:
    """Batched gather-free refinement. Returns (B, N) int32 labels.

    ``pixel_pix`` is the FLAT pixel id per point (``v * W + u``, e.g.
    ``RangeImage.pixel_pix`` from ops/range_proj.py) — a (B, N, 2) uv
    array would tile-pad its minor dim 2 -> 128 lanes on every pass.
    """
    b, n = point_range.shape
    h, w = image_range.shape[1:]
    hw = h * w
    half = window // 2
    s2 = window * window
    assert 2 * s2 <= 128, "window too large for the 128-lane table"
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    # 1. image-space neighborhood COLUMN table (B, 2*S², HW). Labels
    #    and validity share one packed channel (valid ? label+1 : 0) —
    #    round 5: the table's DMA / spread / fill costs all scale with
    #    channel width, and 2*S² = 50 rides 56 sublanes in the column
    #    layout (the round-4 row form padded every image-space
    #    intermediate's minor dim to 128 lanes).
    table_cols = _build_table_cols(
        image_range, image_labels, image_mask, half, s2)

    # 2. co-sort points by pixel id (original index rides along).
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    pix_s, idx_s, range_s = jax.lax.sort(
        (pixel_pix, idx, point_range), dimension=1, num_keys=2)

    # 3. deliver each occupied pixel's row to its first point (the
    #    tag-merge used by the sparse-conv rulebook), then forward-fill
    #    down each pixel's point segment.
    first_rows = _deliver_rows(table_cols, pix_s, hw, n, interpret)
    # (B, N, 2*s2) — zero rows everywhere except each segment's start.
    filled = _forward_fill(first_rows, pix_s, fill_depth)

    # 4. flat k-NN vote (labels unpacked from the shared channel).
    refined, has_vote = _vote(filled, range_s, s2, k, num_classes,
                              cutoff)

    # Fallback to the projected label (pre-refinement behavior) for
    # points with no valid vote — empty/cutoff window, or a pixel
    # segment deeper than fill_depth (whose rows are zero-filled), so
    # the center lane cannot serve as the fallback. One scalar gather
    # per point (N x 4 bytes) is the only remaining gather in the op —
    # taken directly in SORTED order with pix_s (the round-4 form
    # gathered in original order and paid a third full co-sort to
    # permute the result).
    lab_flat = image_labels.reshape(b, hw)
    fb_s = jnp.take_along_axis(
        lab_flat, jnp.clip(pix_s, 0, hw - 1), axis=1)       # (B, N)
    refined_s = jnp.where(has_vote, refined, fb_s)

    # 5. back to original point order.
    _, out = jax.lax.sort((idx_s, refined_s), dimension=1, num_keys=1)
    return out


def knn_refine(
    point_range: jax.Array,
    pixel_uv: jax.Array,
    image_range: jax.Array,
    image_labels: jax.Array,
    image_mask: jax.Array,
    *,
    window: int = 5,
    k: int = 5,
    num_classes: int = 20,
    cutoff: float = 1.0,
) -> jax.Array:
    """Single-cloud wrapper of :func:`knn_refine_batch` (takes (N, 2)
    uv for API parity with the reference class)."""
    w = image_range.shape[-1]
    pix = pixel_uv[:, 0].astype(jnp.int32) * w \
        + pixel_uv[:, 1].astype(jnp.int32)
    return knn_refine_batch(
        point_range[None], pix[None], image_range[None],
        image_labels[None], image_mask[None],
        window=window, k=k, num_classes=num_classes, cutoff=cutoff)[0]

"""O11 — rotated NMS, fully on device (SURVEY.md §2.3 O11).

Reference form: CUDA bitmask NMS with host-side thresholding. TPU-native
design: **block-greedy** suppression with lazy row-wise IoU. Round-2
emitted one box per ``while_loop`` round (one lazy IoU row each);
measured on v5e the loop is round-LATENCY-bound, not pair-bound —
128 rounds of tiny ops cost ~7.7 ms/batch-8 while each 1 x nms_pre
IoU row is microseconds. So each round now takes the top ``block``
(16) surviving candidates at once. This is EXACTLY greedy: every
non-block candidate scores below every block member, so greedy's next
``block`` picks are decided inside the block alone — member i is
emitted iff no higher-scoring emitted member of the same block
suppresses it (a 16-step unrolled closure over the precomputed 16x16
in-block IoU), and emitted members then kill their overlaps in one
(block x nms_pre) masked reduction. A scene with D detections pays
~ceil(D/16)+1 rounds instead of D+1. The loop still exits early: if
any block member falls below the score threshold, every remaining
candidate (all scoring lower) does too. Everything is static-shape
inside the one jitted inference program, so a cloud makes a single
host<->device round trip (BASELINE.json:5).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lisec_tpu.ops.rotated_iou import rotated_iou_bev


class NMSResult(NamedTuple):
    boxes: jax.Array      # (nms_post, 7)
    scores: jax.Array     # (nms_post,)
    labels: jax.Array     # (nms_post,) int32
    valid: jax.Array      # (nms_post,) bool


@partial(jax.jit, static_argnames=("nms_pre", "nms_post", "block",
                                   "k_near", "select", "class_parallel",
                                   "_ablate"))
def rotated_nms(
    boxes: jax.Array,
    scores: jax.Array,
    labels: jax.Array,
    *,
    iou_threshold: float,
    score_threshold: float = 0.0,
    nms_pre: int = 1024,
    nms_post: int = 128,
    block: int = 16,
    k_near: int = 0,
    select: str = "topk",
    class_parallel: int = 0,
    _ablate: str = "",
) -> NMSResult:
    """Greedy class-aware rotated NMS over one cloud's detections.

    boxes: (A, 7); scores: (A,); labels: (A,) int32. Boxes of different
    classes never suppress each other. Emits up to ``nms_post`` boxes in
    descending score order. ``block`` is a pure performance knob (the
    result is exact greedy NMS for any value). ``k_near`` > 0 bounds the
    exact-IoU work per emitted box to its k_near nearest same-class
    candidates (circle prefilter); 0 = full rows (always exact).
    ``select`` picks how each round finds its top-``block`` alive
    candidates: "topk" (masked top_k sort) or "scan" (the preselect
    already score-sorts the candidates, so the top-``block`` alive ones
    are the FIRST ``block`` alive slots in index order — a cumsum
    compaction, no per-round sort; same result including ties).
    ``class_parallel`` > 0 (the class count) runs one greedy stream PER
    CLASS, vmapped, and merges by score: classes never suppress each
    other, so per-class greedy is exactly global greedy restricted to
    the class and the merged top-``nms_post`` set is identical
    (emission order between EXACTLY-tied scores of different classes
    may differ — measure-zero for float scores). The win is structural
    for a TRAINED head: the while_loop trip count drops from
    ceil(sum_c D_c / block) to max_c ceil(D_c / block) rounds, and the
    loop is round-LATENCY-bound in the deployment regime (measured
    round 5: an untrained head's near-identical boxes all die in ~2
    rounds — 12.6 ms/b32 — while a trained head's spread detections
    forced ~24 ms/b32 of sequential rounds).
    ``_ablate`` is profiling-only ("skip_iou", "fixed_near",
    comma-separable) and changes results.
    """
    neg_inf = jnp.array(-jnp.inf, scores.dtype)
    nms_pre = min(nms_pre, scores.shape[0])
    block = min(block, nms_pre)
    full = k_near <= 0 or k_near >= nms_pre
    k_near = nms_pre if full else k_near

    # Static top-k preselect by score.
    top_scores, order = jax.lax.top_k(scores, nms_pre)
    top_boxes = boxes[order]
    top_labels = labels[order]
    alive = top_scores > score_threshold
    # Half-diagonal of every candidate: IoU > 0 requires the two
    # centers to be closer than the sum of half-diagonals (the circle
    # prefilter bound used by the k_near compaction).
    half_diag = 0.5 * jnp.hypot(top_boxes[:, 3], top_boxes[:, 4])

    # NOTE (measured): precomputing all corners outside the loop and
    # gathering `corners[i]` per round is SLOWER (12.2 vs 7.7 ms/batch-8)
    # than recomputing the row's corner geometry — per-round dynamic
    # row gathers hit the ~2 GB/s gather ceiling and block fusion,
    # while 4 sin/cos per candidate fuse into the row arithmetic.
    # NOTE (measured, round 3): NMS time is PAIR-bound, not round-bound
    # — the per-pair enumeration IoU runs at the same ~7 ns/pair as the
    # assigner once pair dims are flat, and block-greedy alone (same
    # total pairs) measured the same 8 ms/batch-8. The win is cutting
    # pairs: exact IoU only for the <= k_near nearest same-class
    # candidates inside the circle bound.

    ablate = set(filter(None, _ablate.split(",")))

    def pair_iou(a, b):
        # Flatten pair dims before the IoU: tiny trailing geometry dims
        # on a deep layout tile-pad 50x (CLAUDE.md measured 353 vs
        # 7 ns/pair).
        shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
        a = jnp.broadcast_to(a, shape + (7,)).reshape(-1, 7)
        b = jnp.broadcast_to(b, shape + (7,)).reshape(-1, 7)
        if "skip_iou" in ablate:   # profiling: same layout, no IoU math
            return jnp.sum(a * b, axis=-1).reshape(shape)
        return rotated_iou_bev(a, b).reshape(shape)

    def cond(state):
        j, cont, *_ = state
        return (j < nms_post) & cont

    def body(state):
        j, _, alive, out_idx, out_valid = state  # alive: this stream's
        if select == "scan":
            # Candidates are already score-sorted descending, so this
            # round's top-`block` alive set is the first `block` alive
            # slots in index order: one cumsum + a (nms_pre,)-element
            # drop-scatter instead of a masked top_k sort. Unfilled
            # slots (fewer than `block` alive) read slot 0 and are
            # masked to -inf — identical to top_k's padding behavior.
            pos = jnp.cumsum(alive.astype(jnp.int32))
            slot = jnp.where(alive & (pos <= block), pos - 1, block)
            bi = jnp.zeros((block + 1,), jnp.int32).at[slot].set(
                jnp.arange(nms_pre, dtype=jnp.int32), mode="drop")[:block]
            filled = jnp.arange(block) < pos[-1]
            bs = jnp.where(filled, top_scores[bi], neg_inf)
        else:
            masked = jnp.where(alive, top_scores, neg_inf)
            bs, bi = jax.lax.top_k(masked, block)      # (block,) desc
        bok = bs > score_threshold
        bboxes = top_boxes[bi]                         # (block, 7)
        blabels = top_labels[bi]

        if full:
            m = pair_iou(bboxes[:, None, :], top_boxes[None, :, :])
            near_idx = jnp.broadcast_to(
                jnp.arange(nms_pre)[None, :], (block, nms_pre))
            near_ok = blabels[:, None] == top_labels[None, :]
        else:
            # Circle prefilter + compaction: only the k_near nearest
            # same-class candidates can be suppressed by a block member
            # (center distance >= sum of half-diagonals => IoU = 0).
            # k_near is a budget in the same sense as nms_pre: exact
            # unless more than k_near same-class candidates overlap one
            # emitted box's circle, which real box-size/anchor geometry
            # keeps far below the default 128.
            d2 = ((bboxes[:, None, 0] - top_boxes[None, :, 0]) ** 2
                  + (bboxes[:, None, 1] - top_boxes[None, :, 1]) ** 2)
            rad = half_diag[bi][:, None] + half_diag[None, :]
            near = ((d2 < rad * rad)
                    & (blabels[:, None] == top_labels[None, :]))
            if "fixed_near" in ablate:  # profiling: no compaction sort
                near_idx = jnp.broadcast_to(
                    jnp.arange(k_near)[None, :], (block, k_near))
            else:
                key = jnp.where(near, -d2, -jnp.inf)
                _, near_idx = jax.lax.top_k(key, k_near)  # (block, k_near)
            near_ok = jnp.take_along_axis(near, near_idx, axis=1)
            m = pair_iou(bboxes[:, None, :], top_boxes[near_idx])

        # In-block IoU sub-matrix for the greedy closure (block^2 pairs
        # — cheap to compute directly, and the compacted m may not
        # contain every in-block pair).
        mb = pair_iou(bboxes[:, None, :], bboxes[None, :, :])
        same = blabels[:, None] == blabels[None, :]
        sup_in = (mb > iou_threshold) & same           # j suppresses i

        # Greedy closure inside the block, unrolled (block is static and
        # small; each step is one (block,)-wide masked reduction).
        emitted = jnp.zeros((block,), bool)
        for i in range(block):
            hit = jnp.any(emitted & sup_in[:, i])
            emitted = emitted.at[i].set(bok[i] & ~hit)

        # Emitted members kill their overlaps (scatter the compacted
        # kill bits back to candidate slots; a few thousand bits, far
        # under the scatter ceiling's relevance). Retiring the winners
        # themselves rides IoU(self, self) = 1 > threshold, plus an
        # explicit write for degenerate zero-area boxes.
        kill = near_ok & (m > iou_threshold) & emitted[:, None]
        tgt = jnp.where(kill, near_idx, nms_pre).reshape(-1)
        tgt = jnp.concatenate([tgt, jnp.where(emitted, bi, nms_pre)])
        killed = jnp.zeros((nms_pre + 1,), bool).at[tgt].set(True)
        alive = alive & ~killed[:nms_pre]

        # Compact this round's emissions into the output (descending
        # score order is preserved: later rounds only see lower scores).
        pos = j + jnp.cumsum(emitted.astype(jnp.int32)) - 1
        write = emitted & (pos < nms_post)
        slot = jnp.where(write, pos, nms_post)
        out_idx = out_idx.at[slot].set(bi, mode="drop")
        out_valid = out_valid.at[slot].set(True, mode="drop")
        j = j + jnp.sum(write.astype(jnp.int32))

        # If ANY block member is below the score threshold then every
        # remaining candidate (all scoring <= bs[-1] <= threshold) is
        # too — stopping is exactly equivalent to running on.
        return j, bok[block - 1], alive, out_idx, out_valid

    def run_stream(alive0):
        # while_loop instead of a fixed fori_loop: once the masked max
        # drops to/below the score threshold it can never recover
        # (scores only get masked further), so stopping early is EXACTLY
        # equivalent to running all rounds — a scene with D real
        # detections pays ~ceil(D/block)+1 latency-bound rounds.
        _, _, _, oi, ov = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.asarray(True), alive0,
             jnp.zeros((nms_post,), jnp.int32),
             jnp.zeros((nms_post,), bool)))
        return oi, ov

    if class_parallel > 1:
        cls_ids = jnp.arange(class_parallel, dtype=top_labels.dtype)
        alive_c = alive[None, :] & (top_labels[None, :]
                                    == cls_ids[:, None])   # (C, pre)
        oi_c, ov_c = jax.vmap(run_stream)(alive_c)         # (C, post)
        # Merge the per-class emissions by score (each stream already
        # descends, so the global top-nms_post by score is the global
        # greedy output set in the global emission order).
        sc = jnp.where(ov_c, top_scores[oi_c], neg_inf).reshape(-1)
        _, mi = jax.lax.top_k(sc, nms_post)
        out_idx = oi_c.reshape(-1)[mi]
        out_valid = ov_c.reshape(-1)[mi]
    else:
        out_idx, out_valid = run_stream(alive)

    vb = jnp.where(out_valid[:, None], top_boxes[out_idx], 0.0)
    vs = jnp.where(out_valid, top_scores[out_idx], 0.0)
    vl = jnp.where(out_valid, top_labels[out_idx], -1)
    return NMSResult(vb, vs, vl.astype(jnp.int32), out_valid)

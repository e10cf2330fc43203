"""O11 — rotated NMS, fully on device (SURVEY.md §2.3 O11).

Reference form: CUDA bitmask NMS with host-side thresholding. TPU-native
design: fixed-size greedy suppression with **lazy row-wise IoU** — each
round picks the highest-scoring survivor and suppresses its overlaps,
computing only that box's IoU row (O10, scatter-free). Exactly greedy
NMS semantics truncated to ``nms_post`` emissions, but it evaluates
at most ``nms_post x nms_pre`` IoU pairs instead of the full
``nms_pre^2`` matrix (8x fewer at the default budgets; sequential loop
rounds are ~free on TPU, the pair arithmetic is what costs), and the
round loop is a ``while_loop`` that exits once the best survivor falls
below the score threshold — a scene with D real detections pays D+1
IoU rows, not ``nms_post``. Everything is
static-shape inside the one jitted inference program, so a cloud makes
a single host<->device round trip (BASELINE.json:5).
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


@partial(jax.jit, static_argnames=("nms_pre", "nms_post"))
def rotated_nms(
    boxes: jax.Array,
    scores: jax.Array,
    labels: jax.Array,
    *,
    iou_threshold: float,
    score_threshold: float = 0.0,
    nms_pre: int = 1024,
    nms_post: int = 128,
) -> NMSResult:
    """Greedy class-aware rotated NMS over one cloud's detections.

    boxes: (A, 7); scores: (A,); labels: (A,) int32. Boxes of different
    classes never suppress each other. Emits up to ``nms_post`` boxes in
    descending score order.
    """
    neg_inf = jnp.array(-jnp.inf, scores.dtype)
    nms_pre = min(nms_pre, scores.shape[0])

    # Static top-k preselect by score.
    top_scores, order = jax.lax.top_k(scores, nms_pre)
    top_boxes = boxes[order]
    top_labels = labels[order]
    alive = top_scores > score_threshold

    # NOTE (measured): precomputing all corners outside the loop and
    # gathering `corners[i]` per round is SLOWER (12.2 vs 7.7 ms/batch-8)
    # than recomputing the row's corner geometry — per-round dynamic
    # row gathers hit the ~2 GB/s gather ceiling and block fusion,
    # while 4 sin/cos per candidate fuse into the row arithmetic.

    def cond(state):
        j, cont, *_ = state
        return (j < nms_post) & cont

    def body(state):
        j, _, alive, out_idx, out_valid = state
        masked = jnp.where(alive, top_scores, neg_inf)
        i = jnp.argmax(masked).astype(jnp.int32)
        ok = masked[i] > score_threshold

        # IoU of the winner against every candidate (one lazy row).
        row = rotated_iou_bev(top_boxes[i][None, :], top_boxes)
        kill = (row > iou_threshold) & (top_labels == top_labels[i])
        kill = kill | (jnp.arange(nms_pre) == i)     # retire the winner
        alive = alive & ~(kill & ok)
        out_idx = out_idx.at[j].set(jnp.where(ok, i, 0))
        out_valid = out_valid.at[j].set(ok)
        return j + 1, ok, alive, out_idx, out_valid

    out_idx = jnp.zeros((nms_post,), jnp.int32)
    out_valid = jnp.zeros((nms_post,), bool)
    # while_loop instead of a fixed fori_loop: once the masked max drops
    # to/below the score threshold it can never recover (scores only get
    # masked further), so stopping early is EXACTLY equivalent to
    # running all nms_post rounds — but a scene with 20 real detections
    # pays 21 IoU rows instead of nms_post. Each round costs one
    # (nms_pre,)-wide IoU row, the dominant NMS cost on TPU.
    _, _, _, out_idx, out_valid = jax.lax.while_loop(
        cond, body,
        (jnp.int32(0), jnp.asarray(True), alive, out_idx, out_valid))

    vb = jnp.where(out_valid[:, None], top_boxes[out_idx], 0.0)
    vs = jnp.where(out_valid, top_scores[out_idx], 0.0)
    vl = jnp.where(out_valid, top_labels[out_idx], -1)
    return NMSResult(vb, vs, vl.astype(jnp.int32), out_valid)

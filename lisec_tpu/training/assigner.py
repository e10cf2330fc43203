"""R3 — anchor generation + target assignment (SURVEY.md §2.5 R3).

Anchors: one size per class (e.g. car (3.9, 1.6, 1.56)), two yaws
(0, pi/2), laid on the BEV output grid. Matching is by rotated BEV IoU
(O10) with per-class pos/neg thresholds (car 0.6/0.45), a forced match
for each gt's best anchor, and everything in between ignored — the
SECOND/PointPillars recipe [arch]. Runs fully on device inside the
jitted train step (the reference class does this on CPU in the
dataloader; either side of the boundary is contract-legal, SURVEY.md
§3.2 — on-device keeps the host feed trivial).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lisec_tpu.ops.boxes import encode_boxes
from lisec_tpu.ops.rotated_iou import rotated_iou_bev, rotated_iou_matrix


class AnchorConfig(NamedTuple):
    """Per-class anchor spec."""

    size: Tuple[float, float, float]      # (l, w, h)
    z_center: float
    pos_threshold: float
    neg_threshold: float


DEFAULT_ANCHORS = {
    "Car": AnchorConfig((3.9, 1.6, 1.56), -1.0, 0.6, 0.45),
    "Pedestrian": AnchorConfig((0.8, 0.6, 1.73), -0.6, 0.5, 0.35),
    "Cyclist": AnchorConfig((1.76, 0.6, 1.73), -0.6, 0.5, 0.35),
}

ROTATIONS = (0.0, np.pi / 2)


def generate_anchors(
    anchor_cfgs: Sequence[AnchorConfig],
    *,
    pc_range: Tuple[float, ...],
    feature_map_size: Tuple[int, int],     # (ny_out, nx_out)
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Dense anchor grid matching the head's (y, x, class, rot) layout.

    Returns (anchors (A, 7) f32, anchor_classes (A,) i32,
    pos_thr (A,), neg_thr (A,)) as host numpy (baked into the jitted
    program as constants).
    """
    ny, nx = feature_map_size
    xs = np.linspace(pc_range[0], pc_range[3], nx, endpoint=False) \
        + (pc_range[3] - pc_range[0]) / nx / 2
    ys = np.linspace(pc_range[1], pc_range[4], ny, endpoint=False) \
        + (pc_range[4] - pc_range[1]) / ny / 2

    anchors, classes, pos_t, neg_t = [], [], [], []
    for y in ys:
        for x in xs:
            for ci, cfg in enumerate(anchor_cfgs):
                for rot in ROTATIONS:
                    l, w, h = cfg.size
                    anchors.append([x, y, cfg.z_center, l, w, h, rot])
                    classes.append(ci)
                    pos_t.append(cfg.pos_threshold)
                    neg_t.append(cfg.neg_threshold)
    return (np.asarray(anchors, np.float32),
            np.asarray(classes, np.int32),
            np.asarray(pos_t, np.float32),
            np.asarray(neg_t, np.float32))


class AssignResult(NamedTuple):
    cls_targets: jax.Array      # (A,) int32: -1 ignore, 0 bg, c+1 fg
    reg_targets: jax.Array      # (A, 7) encoded residuals
    dir_targets: jax.Array      # (A,) int32 direction bin
    positive: jax.Array         # (A,) bool


def _window_anchor_columns(
    class_sizes: jax.Array,      # (C, 3)
    class_z: jax.Array,          # (C,)
    gt_boxes: jax.Array,         # (..., M, 7)
    *,
    feature_map_size: Tuple[int, int],
    pc_range: Tuple[float, ...],
    window: int,
):
    """Window-anchor boxes around each gt, built LANE-PACKED.

    Returns (boxes (N, 7) f32 with N = prod(lead) * K, aidx lead+(K,)
    int32 flat anchor index, kc (K,) static int32 class per slot,
    K = window² * C * R). The round-1..3 form concatenated a rank-6
    (M, w, w, C, R, 7) array whose last two dims (2, 7) tile-pad to
    (8, 128) — a ~70x materialization bloat that cost ~13 of the
    assigner's 22 ms (benchmarks/profile_assigner_iou.py: the flat
    pair IoU itself is 5.4 ms). Here every column lives on a 2-D
    lead+(K,) layout (K minor, lane-packed); the per-slot (y, x, class,
    rot) decomposition of the flat window index is STATIC numpy, so
    class-dependent columns are (K,)-constant one-hot matmuls, and the
    only padded materialization is the final rank-2 (N, 7) stack.
    """
    ny, nx = feature_map_size
    num_cls = class_sizes.shape[0]
    num_rot = len(ROTATIONS)
    w = window
    k = w * w * num_cls * num_rot
    step_x = (pc_range[3] - pc_range[0]) / nx
    step_y = (pc_range[4] - pc_range[1]) / ny
    lead = gt_boxes.shape[:-1]

    gx = (gt_boxes[..., 0] - pc_range[0]) / step_x - 0.5
    gy = (gt_boxes[..., 1] - pc_range[1]) / step_y - 0.5
    gx0 = jnp.clip(jnp.round(gx).astype(jnp.int32) - w // 2, 0,
                   max(nx - w, 0))                    # lead
    gy0 = jnp.clip(jnp.round(gy).astype(jnp.int32) - w // 2, 0,
                   max(ny - w, 0))

    # Static per-slot decomposition: slot t -> (wy, wx, cls, rot).
    t = np.arange(k)
    ky = jnp.asarray((t // (w * num_cls * num_rot)).astype(np.int32))
    kx = jnp.asarray(((t // (num_cls * num_rot)) % w).astype(np.int32))
    kc_np = ((t // num_rot) % num_cls).astype(np.int32)
    kr_np = (t % num_rot).astype(np.int32)
    onehot_c = jnp.asarray(np.eye(num_cls, dtype=np.float32)[kc_np])
    az_k = onehot_c @ class_z                         # (K,)
    asz_k = onehot_c @ class_sizes                    # (K, 3)
    rot_k = jnp.asarray(np.asarray(ROTATIONS, np.float32)[kr_np])

    iy = gy0[..., None] + ky                          # lead + (K,)
    ix = gx0[..., None] + kx
    ax = pc_range[0] + (ix.astype(jnp.float32) + 0.5) * step_x
    ay = pc_range[1] + (iy.astype(jnp.float32) + 0.5) * step_y
    shape = lead + (k,)
    n = int(np.prod(shape))
    cols = (ax, ay, jnp.broadcast_to(az_k, shape),
            jnp.broadcast_to(asz_k[:, 0], shape),
            jnp.broadcast_to(asz_k[:, 1], shape),
            jnp.broadcast_to(asz_k[:, 2], shape),
            jnp.broadcast_to(rot_k, shape))
    boxes = jnp.stack([c.reshape(n) for c in cols], axis=-1)   # (N, 7)
    aidx = ((iy * nx + ix) * (num_cls * num_rot)
            + jnp.asarray(kc_np) * num_rot + jnp.asarray(kr_np))
    return boxes, aidx, jnp.asarray(kc_np)


def _gt_columns(gt_boxes: jax.Array, k: int) -> jax.Array:
    """gt boxes repeated per window slot, (N, 7), same lane-packed
    construction as :func:`_window_anchor_columns` (a broadcast+reshape
    of the rank-3 lead+(K, 7) form would relayout through the padded
    trailing-7 tile)."""
    lead = gt_boxes.shape[:-1]
    shape = lead + (k,)
    n = int(np.prod(shape))
    return jnp.stack(
        [jnp.broadcast_to(gt_boxes[..., c:c + 1], shape).reshape(n)
         for c in range(7)], axis=-1)


@partial(jax.jit, static_argnames=("feature_map_size", "pc_range",
                                   "window"))
def assign_targets_windowed(
    anchors: jax.Array,          # (A, 7) flat anchor constants
    anchor_classes: jax.Array,   # (A,) int32
    pos_thr: jax.Array,          # (A,)
    neg_thr: jax.Array,          # (A,)
    class_sizes: jax.Array,      # (C, 3) anchor (l, w, h) per class
    class_z: jax.Array,          # (C,)
    gt_boxes: jax.Array,         # (M, 7)
    gt_classes: jax.Array,       # (M,) int32
    gt_mask: jax.Array,          # (M,) bool
    *,
    feature_map_size: Tuple[int, int],    # (ny, nx)
    pc_range: Tuple[float, ...],
    window: int = 32,
) -> AssignResult:
    """Windowed target assignment — identical outputs to
    :func:`assign_targets`, ~50x less IoU work.

    The dense assigner evaluates a (107k anchors x M gts) rotated-IoU
    matrix per frame (~570 ms/batch-4 measured — 74% of the train
    step). But anchors sit on a REGULAR grid, and IoU is identically 0
    once center distance exceeds (gt diag + anchor diag)/2, so each gt
    only interacts with a `window`-cell square around it. Window anchor
    parameters are generated ARITHMETICALLY from the grid (no gather),
    IoU runs on (M, window², C, R) pairs, and the per-anchor reductions
    go back through a handful of scalar scatters:

      * best_iou: scatter-max of pair IoUs (order independent);
      * best_gt:  gather-back + float-equality winner test, then
        scatter-min of gt index (ties -> lowest gt, matching argmax);
      * forced match: per-gt argmax within its own window (the global
        best lives there by construction; flattened window order equals
        global anchor-index order for a fixed gt, so ties break
        identically).

    Outside-window anchors keep best_iou = -1 (dense: 0 or -1) — both
    are below every neg threshold, so cls/reg/dir outputs agree.
    `window` must satisfy window * cell_size >= gt_diag + anchor_diag
    (32 cells x 0.32 m covers KITTI cars with margin).
    """
    a = anchors.shape[0]
    m = gt_boxes.shape[0]
    num_cls = class_sizes.shape[0]
    num_rot = len(ROTATIONS)
    w = window
    k = w * w * num_cls * num_rot

    # Window anchors + flat pair IoU, all on lane-packed 2-D layouts
    # (see _window_anchor_columns; the old rank-6 construction cost
    # ~2.4x the IoU itself in padded-tile materializations).
    win_boxes, aidx, kc = _window_anchor_columns(
        class_sizes, class_z, gt_boxes,
        feature_map_size=feature_map_size, pc_range=pc_range,
        window=window)                    # (M*K, 7), (M, K), (K,)
    iou = rotated_iou_bev(win_boxes, _gt_columns(gt_boxes, k))
    iou = iou.reshape(m, k)
    pair_ok = (gt_mask.astype(bool)[:, None]
               & (kc[None, :] == gt_classes[:, None]))  # (M, K)
    iou = jnp.where(pair_ok, iou, -1.0)

    iou_f = iou.reshape(m * k)
    ok_f = pair_ok.reshape(m * k)
    aidx_f = jnp.where(ok_f, aidx.reshape(m * k), a)
    gt_idx_f = jnp.repeat(jnp.arange(m, dtype=jnp.int32), k)

    best_iou = jnp.full((a + 1,), -1.0).at[aidx_f].max(
        iou_f, mode="drop")[:a]
    # Winner pairs: exact float equality against the gathered max (the
    # same computed value round-trips the scatter).
    got = jnp.concatenate([best_iou, jnp.full((1,), -1.0)])[aidx_f]
    winner = ok_f & (iou_f >= 0) & (iou_f == got)
    best_gt = jnp.full((a + 1,), m, jnp.int32).at[
        jnp.where(winner, aidx_f, a)].min(gt_idx_f, mode="drop")[:a]
    best_gt = jnp.where(best_iou >= 0, best_gt, 0)

    # Forced match: per-gt argmax within its window (lowest flat index
    # on ties == dense argmax tie-break).
    iou_per_gt = iou.reshape(m, k)
    best_k = jnp.argmax(iou_per_gt, axis=1)
    gt_best_anchor = jnp.take_along_axis(
        aidx.reshape(m, k), best_k[:, None], axis=1)[:, 0]
    gt_has_overlap = jnp.max(iou_per_gt, axis=1) > 0
    gt_claims = gt_mask.astype(bool) & gt_has_overlap
    claim_idx = jnp.where(gt_claims, gt_best_anchor, a)
    forced = jnp.zeros((a,), bool).at[claim_idx].set(True, mode="drop")
    claimed_gt = jnp.zeros((a,), jnp.int32).at[claim_idx].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop")
    best_gt = jnp.where(forced, claimed_gt, best_gt)

    positive = (best_iou >= pos_thr) | forced
    negative = (best_iou < neg_thr) & ~positive

    # matched gt rows via one-hot matmul (a 107k-row gather from a
    # 64-row table costs more than 96 MFLOP on the MXU).
    onehot = jax.nn.one_hot(best_gt, m, dtype=jnp.float32)
    matched_boxes = onehot @ gt_boxes                   # (A, 7)
    matched_cls = jnp.round(
        onehot @ gt_classes.astype(jnp.float32)).astype(jnp.int32)
    reg_targets = encode_boxes(matched_boxes, anchors)
    dir_targets = (jnp.mod(matched_boxes[:, 6], 2 * jnp.pi)
                   < jnp.pi).astype(jnp.int32)

    cls_targets = jnp.where(
        positive, matched_cls + 1,
        jnp.where(negative, 0, -1)).astype(jnp.int32)
    return AssignResult(cls_targets, reg_targets, dir_targets, positive)


@partial(jax.jit, static_argnames=("feature_map_size", "pc_range",
                                   "window", "cols"))
def assign_targets_windowed_batched(
    anchors: jax.Array,          # (A, 7) flat anchor constants
    anchor_classes: jax.Array,   # (A,) int32
    pos_thr: jax.Array,          # (A,)
    neg_thr: jax.Array,          # (A,)
    class_sizes: jax.Array,      # (C, 3)
    class_z: jax.Array,          # (C,)
    gt_boxes: jax.Array,         # (B, M, 7)
    gt_classes: jax.Array,       # (B, M) int32
    gt_mask: jax.Array,          # (B, M) bool
    *,
    feature_map_size: Tuple[int, int],
    pc_range: Tuple[float, ...],
    window: int = 32,
    cols: bool = False,          # reg_targets as (B, 7, A) columns
) -> AssignResult:
    """Batched windowed assignment with SORT-based per-anchor reduction
    — same outputs as :func:`assign_targets_windowed`, no scalar
    scatters on the hot path.

    The per-frame version reconstructs per-anchor results with three
    scalar scatter/gather passes over the ~131k window pairs (~7 ns/row
    each on XLA:TPU — ~11 ms/batch-4, half the assigner). Here the
    pairs are co-sorted by (anchor, -iou, gt) — multi-operand sorts are
    ~free on this chip — which makes each anchor's pairs a contiguous
    segment whose FIRST row is the winner (max IoU, ties to lowest gt,
    exactly the dense argmax tie-break). One slab-paint pass
    (ops/pallas/pillar_paint.py, exact bf16x3 routing = bit-exact
    selection) then reduces the segments:

      channel 0 (max)  = IoU            -> best_iou per anchor
      channel 1 (max)  = M - gt on the segment-start row, -inf
                         elsewhere      -> winner gt per anchor
      channel 7 (sum)  = 1              -> occupancy (empty -> -1/0)

    IoUs are canonicalized with ``+ 0.0`` so -0.0 ties cannot order
    differently from the == comparison the scatter version used.
    """
    b, m = gt_boxes.shape[:2]
    a = anchors.shape[0]
    num_cls = class_sizes.shape[0]
    num_rot = len(ROTATIONS)
    w = window
    k = w * w * num_cls * num_rot

    # Lane-packed window construction (see _window_anchor_columns).
    win_boxes, aidx, kc = _window_anchor_columns(
        class_sizes, class_z, gt_boxes,
        feature_map_size=feature_map_size, pc_range=pc_range,
        window=window)                # (B*M*K, 7), (B, M, K), (K,)
    iou = rotated_iou_bev(win_boxes, _gt_columns(gt_boxes, k))
    iou = iou.reshape(b, m, k) + 0.0        # -0.0 -> +0.0 (tie order)
    pair_ok = (gt_mask.astype(bool)[:, :, None]
               & (kc[None, None, :] == gt_classes[:, :, None]))
    iou = jnp.where(pair_ok, iou, -1.0)     # (B, M, K)

    mk = m * k
    iou_f = iou.reshape(b, mk)
    ok_f = pair_ok.reshape(b, mk)
    aidx_f = jnp.where(ok_f, aidx.reshape(b, mk), a)
    gt_idx_f = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[None, :, None],
        (b, m, k)).reshape(b, mk)

    aidx_s, neg_iou_s, gt_s = jax.lax.sort(
        (aidx_f, -iou_f, gt_idx_f), dimension=1, num_keys=3)
    iou_s = -neg_iou_s
    prev = jnp.concatenate(
        [jnp.full((b, 1), -1, jnp.int32), aidx_s[:, :-1]], axis=1)
    is_start = aidx_s != prev

    from lisec_tpu.ops.pallas.pillar_paint import segment_paint
    interpret = jax.devices()[0].platform != "tpu"
    vals = jnp.stack([
        iou_s,
        jnp.where(is_start, (m - gt_s).astype(jnp.float32), -3.0e38),
        jnp.zeros((b, mk), jnp.float32),
        jnp.zeros((b, mk), jnp.float32),
        jnp.zeros((b, mk), jnp.float32),
        jnp.zeros((b, mk), jnp.float32),
        jnp.zeros((b, mk), jnp.float32),
        jnp.ones((b, mk), jnp.float32),
    ], axis=-1)                                           # (B, MK, 8)
    tab = segment_paint(
        vals, aidx_s, num_cells=a, num_max=2, count_channel=7,
        slab=2048, window=512, exact=True, interpret=interpret)
    occupied = tab[..., 7] > 0.0                          # (B, A)
    best_iou = jnp.where(occupied, tab[..., 0], -1.0)
    best_gt = jnp.where(
        occupied & (best_iou >= 0),
        m - jnp.round(tab[..., 1]).astype(jnp.int32), 0)
    best_gt = jnp.clip(best_gt, 0, m - 1)

    # Forced match: per-gt argmax within its window (M rows per frame —
    # the small scatters are off the hot path).
    iou_per_gt = iou.reshape(b, m, k)
    best_k = jnp.argmax(iou_per_gt, axis=2)
    gt_best_anchor = jnp.take_along_axis(
        aidx.reshape(b, m, k), best_k[..., None], axis=2)[..., 0]
    gt_claims = (gt_mask.astype(bool)
                 & (jnp.max(iou_per_gt, axis=2) > 0))     # (B, M)
    claim_idx = jnp.where(gt_claims, gt_best_anchor, a)
    bidx = jnp.arange(b, dtype=jnp.int32)[:, None]
    forced = jnp.zeros((b, a), bool).at[bidx, claim_idx].set(
        True, mode="drop")
    claimed_gt = jnp.zeros((b, a), jnp.int32).at[bidx, claim_idx].set(
        jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (b, m)),
        mode="drop")
    best_gt = jnp.where(forced, claimed_gt, best_gt)

    positive = (best_iou >= pos_thr) | forced
    negative = (best_iou < neg_thr) & ~positive

    onehot = jax.nn.one_hot(best_gt, m, dtype=jnp.float32)  # (B, A, M)
    matched_cls = jnp.round(jnp.einsum(
        "bam,bm->ba", onehot, gt_classes.astype(jnp.float32))
    ).astype(jnp.int32)
    if cols:
        # Channel-leading layout end to end: the einsum writes (B,7,A)
        # straight off the MXU and the residual encode runs on (B, A)
        # column slices — the (B, A, 7) row form (minor dim 7 -> 128
        # lane tiles, 18x padded) is never materialized. See
        # ops/boxes.py::encode_boxes_cols.
        from lisec_tpu.ops.boxes import encode_boxes_cols
        matched_c = jnp.einsum("bam,bmc->bca", onehot, gt_boxes)
        reg_targets = encode_boxes_cols(matched_c, anchors.T)
        dir_targets = (jnp.mod(matched_c[:, 6], 2 * jnp.pi)
                       < jnp.pi).astype(jnp.int32)
    else:
        matched_boxes = jnp.einsum("bam,bmc->bac", onehot, gt_boxes)
        reg_targets = encode_boxes(
            matched_boxes.reshape(-1, 7),
            jnp.broadcast_to(anchors[None], (b, a, 7)).reshape(-1, 7)
        ).reshape(b, a, 7)
        dir_targets = (jnp.mod(matched_boxes[..., 6], 2 * jnp.pi)
                       < jnp.pi).astype(jnp.int32)

    cls_targets = jnp.where(
        positive, matched_cls + 1,
        jnp.where(negative, 0, -1)).astype(jnp.int32)
    return AssignResult(cls_targets, reg_targets, dir_targets, positive)


@partial(jax.jit, static_argnames=("row_chunk",))
def assign_targets(
    anchors: jax.Array,
    anchor_classes: jax.Array,
    pos_thr: jax.Array,
    neg_thr: jax.Array,
    gt_boxes: jax.Array,
    gt_classes: jax.Array,
    gt_mask: jax.Array,
    *,
    row_chunk: int = 0,
) -> AssignResult:
    """Single-frame assignment: anchors (A, 7) vs gt (M, 7)."""
    a = anchors.shape[0]
    m = gt_boxes.shape[0]

    iou = rotated_iou_matrix(anchors, gt_boxes, row_chunk=row_chunk)  # (A,M)
    valid = gt_mask.astype(bool)[None, :] \
        & (anchor_classes[:, None] == gt_classes[None, :])
    iou = jnp.where(valid, iou, -1.0)

    best_gt = jnp.argmax(iou, axis=1)                       # (A,)
    best_iou = jnp.max(iou, axis=1)

    # Forced match: each valid gt claims its best anchor (ties -> lowest
    # anchor index). Standard recipe guarantees every gt is learned.
    best_anchor_per_gt = jnp.argmax(iou, axis=0)            # (M,)
    gt_has_overlap = jnp.max(iou, axis=0) > 0
    # A padded gt's IoU column is all -1, so its argmax is anchor 0 —
    # route those writes out of range (mode='drop') so duplicate-index
    # scatter order can never clobber a real gt's claim at anchor 0.
    gt_claims = gt_mask.astype(bool) & gt_has_overlap
    claim_idx = jnp.where(gt_claims, best_anchor_per_gt, a)
    forced = jnp.zeros((a,), bool).at[claim_idx].set(True, mode="drop")
    # The forced anchor's best_gt must be the gt that claimed it.
    claimed_gt = jnp.zeros((a,), jnp.int32).at[claim_idx].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop")
    best_gt = jnp.where(forced, claimed_gt, best_gt)

    positive = (best_iou >= pos_thr) | forced
    negative = (best_iou < neg_thr) & ~positive

    matched_boxes = gt_boxes[best_gt]                       # (A, 7)
    matched_cls = gt_classes[best_gt]
    reg_targets = encode_boxes(matched_boxes, anchors)
    # Direction bin from the gt's absolute yaw (SECOND convention).
    dir_targets = (jnp.mod(matched_boxes[:, 6], 2 * jnp.pi)
                   < jnp.pi).astype(jnp.int32)

    cls_targets = jnp.where(
        positive, matched_cls + 1,
        jnp.where(negative, 0, -1)).astype(jnp.int32)
    return AssignResult(cls_targets, reg_targets, dir_targets, positive)

"""Workload 3/4 — anchor-based 3D detection pipelines
(SURVEY.md §3.1/§3.2: the north-star path).

The jitted device program is the whole chain: voxelize (O1) -> encoder
-> backbone -> head -> decode (O9) -> rotated NMS (O11/O10). A padded
cloud goes in, final boxes/scores/labels come out — exactly one
host<->device round trip per batch (BASELINE.json:5). Training assigns
targets on device (R3) and uses the focal/sin-difference/direction loss
recipe (R2).

``PointPillarsPipeline`` is workload 3; ``SECONDPipeline`` (workload 4)
subclasses it, swapping the pillar encoder for voxel + sparse 3D conv.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from lisec_tpu.config import Config
from lisec_tpu.data.augment import GTSampler, augment_detection
from lisec_tpu.data.kitti import KittiDetection
from lisec_tpu.models.pointpillars import PointPillars, PointPillarsFused
from lisec_tpu.models.second import SECONDNet
from lisec_tpu.ops.boxes import decode_boxes
from lisec_tpu.ops.nms import rotated_nms
from lisec_tpu.ops.voxelize import voxelize_batch
from lisec_tpu.pipelines.base import Pipeline
from lisec_tpu.registry import register_pipeline, register_model
from lisec_tpu.training.assigner import (
    DEFAULT_ANCHORS, AnchorConfig, assign_targets,
    assign_targets_windowed, assign_targets_windowed_batched,
    generate_anchors)
from lisec_tpu.training.losses import (
    sigmoid_focal_loss, sin_difference_cols, smooth_l1)

register_model("pointpillars")(PointPillars)


@register_pipeline("pointpillars")
class PointPillarsPipeline(Pipeline):
    OUTPUT_STRIDE = 2

    def __init__(self, cfg: Config):
        super().__init__(cfg)
        self.class_names = tuple(cfg.data.class_names) or ("Car",)
        self.num_classes = len(self.class_names)
        self.grid = cfg.voxel.grid_size                   # (nx, ny, nz)
        self.fmap = (self.grid[1] // self.OUTPUT_STRIDE,
                     self.grid[0] // self.OUTPUT_STRIDE)  # (ny, nx)
        p = cfg.model.params

        anchor_cfgs = []
        for name in self.class_names:
            base = DEFAULT_ANCHORS.get(
                name, DEFAULT_ANCHORS["Car"])
            over = p.get("anchors", {}).get(name, {})
            anchor_cfgs.append(AnchorConfig(
                tuple(over.get("size", base.size)),
                float(over.get("z_center", base.z_center)),
                float(over.get("pos_threshold", base.pos_threshold)),
                float(over.get("neg_threshold", base.neg_threshold))))
        anchors, acls, pos_t, neg_t = generate_anchors(
            anchor_cfgs, pc_range=cfg.voxel.point_cloud_range,
            feature_map_size=self.fmap)
        self.anchors = jnp.asarray(anchors)
        self.anchor_classes = jnp.asarray(acls)
        self.pos_thr = jnp.asarray(pos_t)
        self.neg_thr = jnp.asarray(neg_t)
        self.class_sizes = jnp.asarray(
            [c.size for c in anchor_cfgs], jnp.float32)
        self.class_z = jnp.asarray(
            [c.z_center for c in anchor_cfgs], jnp.float32)

        self.model = self.build_model(cfg)
        self.loss_weights = {
            "cls": float(p.get("cls_weight", 1.0)),
            "loc": float(p.get("loc_weight", 2.0)),
            "dir": float(p.get("dir_weight", 0.2)),
        }
        self.nms_iou = float(p.get("nms_iou", 0.5))
        self.score_thr = float(p.get("score_threshold", 0.1))
        self.assign_row_chunk = int(p.get("assign_row_chunk", 4096))
        # Windowed assigner (50x less IoU work; 0 = dense reference).
        # The window must cover gt_diag + anchor_diag; clamp so it
        # never exceeds the feature map.
        self.assign_window = min(int(p.get("assign_window", 32)),
                                 min(self.fmap))

    def build_model(self, cfg: Config):
        p = cfg.model.params
        self.fused = bool(p.get("fused", True))
        common = dict(
            num_classes=self.num_classes,
            grid_size=self.grid,
            voxel_size=cfg.voxel.voxel_size[:2],
            num_anchors_per_cell=self.num_classes * 2,
            pfn_filters=int(p.get("pfn_filters", 64)),
            backbone_layers=tuple(p.get("backbone_layers", [3, 5, 5])),
            backbone_filters=tuple(p.get("backbone_filters",
                                         [64, 128, 256])),
            backbone_strides=tuple(p.get("backbone_strides", [2, 2, 2])),
            backbone_up_strides=tuple(p.get("backbone_up_strides",
                                            [1, 2, 4])),
            backbone_up_filters=tuple(p.get("backbone_up_filters",
                                            [128, 128, 128])),
            dtype=jnp.dtype(p.get("dtype", "float32")),
        )
        if self.fused:
            return PointPillarsFused(
                pc_range=cfg.voxel.point_cloud_range,
                fast_encoder=bool(p.get("fast_encoder", True)), **common)
        return PointPillars(
            pc_range_min=cfg.voxel.point_cloud_range[:2], **common)

    # -- data --------------------------------------------------------------

    def make_dataset(self, split: str):
        return KittiDetection(self.cfg, split)

    def augment_fn(self, split: str):
        if split != "train" or not self.cfg.data.augment.enabled:
            return None
        aug = self.cfg.data.augment
        sampler = None
        if aug.gt_sampling:
            sampler = GTSampler(self.make_dataset("train"))
        return lambda s, rng: augment_detection(s, rng, aug, sampler)

    def dummy_batch(self) -> Dict[str, np.ndarray]:
        b = self.cfg.train.batch_size
        n = self.cfg.budget.max_points
        m = self.cfg.budget.max_boxes
        return {
            "points": np.zeros((b, n, 4), np.float32),
            "point_mask": np.ones((b, n), bool),
            "gt_boxes": np.zeros((b, m, 7), np.float32),
            "gt_classes": np.zeros((b, m), np.int32),
            "gt_mask": np.zeros((b, m), bool),
        }

    # -- device program ----------------------------------------------------

    def _voxelize_batch(self, points, point_mask):
        cfg = self.cfg
        return voxelize_batch(
            points, point_mask,
            pc_range=cfg.voxel.point_cloud_range,
            voxel_size=cfg.voxel.voxel_size,
            grid_size=self.grid,
            max_voxels=cfg.budget.max_voxels,
            max_points_per_voxel=cfg.budget.max_points_per_voxel,
        )

    def _model_args(self, batch):
        if getattr(self, "fused", False):
            return (batch["points"], batch["point_mask"])
        vox = self._voxelize_batch(batch["points"], batch["point_mask"])
        return (vox.voxels, vox.coords, vox.num_points, vox.num_voxels)

    def _forward(self, params, batch_stats, batch, train, rng=None):
        args = self._model_args(batch)
        variables = {"params": params, "batch_stats": batch_stats}
        kwargs = dict(mutable=["batch_stats"]) if train else {}
        out = self.model.apply(variables, *args, train=train, **kwargs)
        if train:
            preds, mutated = out
            return preds, mutated["batch_stats"]
        return out, batch_stats

    def init_variables(self, rng, batch):
        return self.model.init(
            {"params": rng}, *self._model_args(batch), train=False)

    # -- training ----------------------------------------------------------

    def loss(self, params, batch_stats, batch, rng, train: bool):
        preds, new_bs = self._forward(
            params, batch_stats, batch, train, rng)

        if self.assign_window:
            assign = assign_targets_windowed_batched(
                self.anchors, self.anchor_classes, self.pos_thr,
                self.neg_thr, self.class_sizes, self.class_z,
                batch["gt_boxes"], batch["gt_classes"], batch["gt_mask"],
                feature_map_size=self.fmap,
                pc_range=tuple(self.cfg.voxel.point_cloud_range),
                window=self.assign_window, cols=True)
        else:
            assign = jax.vmap(lambda b, c, m: assign_targets(
                self.anchors, self.anchor_classes, self.pos_thr,
                self.neg_thr, b, c, m,
                row_chunk=self.assign_row_chunk))(
                    batch["gt_boxes"], batch["gt_classes"],
                    batch["gt_mask"])
            assign = assign._replace(
                reg_targets=assign.reg_targets.transpose(0, 2, 1))

        pos = assign.positive                              # (B, A)
        num_pos = jnp.maximum(jnp.sum(pos), 1.0)

        # The whole loss tail runs CHANNEL-LEADING: head preds transpose
        # ONCE to (B, c, A) (channels on sublanes, anchors on dense
        # 128-lane tiles) and every elementwise pass below is compact.
        # The row layouts ((B, A, c) with c = 3/7/2 minor) tile-pad
        # c -> 128 on TPU; the round-5 train profile measured ~9.5 ms/
        # batch-4 of loss glue on them (loss_fwd 43.0 vs
        # assigner+network 33.5 — benchmarks/profile_train.py).

        # Classification: focal loss, one-vs-all; bg = all-zero targets.
        cls_t = assign.cls_targets                         # (B, A)
        cls_p = preds["cls"].transpose(0, 2, 1)            # (B, C, A)
        cls_ids = jnp.arange(self.num_classes,
                             dtype=cls_t.dtype)[None, :, None]
        onehot = (cls_t[:, None, :] == cls_ids + 1).astype(cls_p.dtype)
        focal = sigmoid_focal_loss(cls_p, onehot)
        valid = (cls_t >= 0)[:, None, :]
        cls_loss = jnp.sum(jnp.where(valid, focal, 0.0)) / num_pos

        # Localization: smooth-L1 on encoded residuals with sin-diff
        # ((B, 7, A) columns straight from the assigner).
        pred_box, target_box = sin_difference_cols(
            preds["box"].transpose(0, 2, 1), assign.reg_targets)
        loc = smooth_l1(pred_box, target_box)
        loc_loss = jnp.sum(
            jnp.where(pos[:, None, :], loc, 0.0)) / num_pos

        # Direction classifier on positives. Two-logit softmax CE
        # reduces to softplus(l_other - l_target) — one (B, A) pass,
        # no (B, A, 2) layout, same value as the softmax form.
        dir_p = preds["dir"].transpose(0, 2, 1)            # (B, 2, A)
        d = dir_p[:, 1] - dir_p[:, 0]
        ce = jax.nn.softplus(jnp.where(assign.dir_targets == 1, -d, d))
        dir_ce = jnp.sum(jnp.where(pos, ce, 0.0)) \
            / jnp.maximum(jnp.sum(pos), 1)

        w = self.loss_weights
        total = (w["cls"] * cls_loss + w["loc"] * loc_loss
                 + w["dir"] * dir_ce)
        aux = {
            "cls_loss": cls_loss,
            "loc_loss": loc_loss,
            "dir_loss": dir_ce,
            "num_pos": jnp.sum(pos) / pos.shape[0],
        }
        return total, (aux, new_bs)

    # -- inference ---------------------------------------------------------

    def predict(self, params, batch_stats, batch):
        preds, _ = self._forward(params, batch_stats, batch, train=False)

        # Preselect nms_pre candidates BY SCORE before any decode math:
        # decoding all ~107k anchors (exp/sincos on (B, A, 7)) and
        # exact top_k over A cost ~1.3 ms/batch-8; approx_max_k rides
        # the TPU sort unit and the decode then touches only the kept
        # rows (the dropped mass is far below the score threshold —
        # recall_target 0.99 at the preselect boundary).
        scores_all = jax.nn.sigmoid(preds["cls"])               # (B,A,C)
        scores = jnp.max(scores_all, axis=-1)
        npre = min(self.cfg.budget.nms_pre, scores.shape[1])
        _, idx = jax.lax.approx_max_k(scores, npre,
                                      recall_target=0.99)

        def take(x):
            return jnp.take_along_axis(x, idx[..., None], axis=1)
        sel_scores_all = take(scores_all)                    # (B,P,C)
        boxes = decode_boxes(take(preds["box"]), self.anchors[idx])

        # Resolve yaw with the direction bin: mod(yaw, pi) selects the
        # in-half angle, the bin picks the half (assigner convention).
        dir_bin = jnp.argmax(take(preds["dir"]), axis=-1)       # (B,P)
        yaw = jnp.mod(boxes[..., 6], jnp.pi)
        yaw = jnp.where(dir_bin == 1, yaw, yaw - jnp.pi)
        boxes = jnp.concatenate([boxes[..., :6], yaw[..., None]], -1)

        sel_scores = jnp.max(sel_scores_all, axis=-1)
        labels = jnp.argmax(sel_scores_all, axis=-1).astype(jnp.int32)

        nms = jax.vmap(lambda b, s, l: rotated_nms(
            b, s, l,
            iou_threshold=self.nms_iou,
            score_threshold=self.score_thr,
            nms_pre=npre,
            nms_post=self.cfg.budget.nms_post,
            k_near=self.cfg.budget.nms_near,
            block=self.cfg.budget.nms_block,
            select=self.cfg.budget.nms_select,
            class_parallel=(self.num_classes
                            if self.cfg.budget.nms_class_parallel
                            and self.num_classes > 1 else 0),
        ))(boxes, sel_scores, labels)
        return {
            "boxes": nms.boxes,
            "scores": nms.scores,
            "labels": nms.labels,
            "valid": nms.valid,
        }

    # -- eval --------------------------------------------------------------

    def evaluate(self, state, max_batches: int = 0) -> Dict[str, float]:
        """Light eval: recall of gt boxes at BEV IoU >= 0.5 plus mean
        detection count (full KITTI AP is O15 / eval.kitti_ap)."""
        from lisec_tpu.data.collate import make_batches
        from lisec_tpu.eval.detection import match_frame

        ds = self.make_dataset("val")
        total_gt, hit_gt, num_det = 0, 0, 0
        n = 0
        for batch in make_batches(
                ds, self.cfg.budget, self.cfg.train.batch_size,
                shuffle=False, epochs=1):
            out = jax.device_get(self.infer(state, batch))
            for i in range(len(batch["points"])):
                stats = match_frame(
                    out["boxes"][i][out["valid"][i]],
                    out["labels"][i][out["valid"][i]],
                    batch["gt_boxes"][i][batch["gt_mask"][i]],
                    batch["gt_classes"][i][batch["gt_mask"][i]],
                    iou_threshold=0.5)
                total_gt += stats["num_gt"]
                hit_gt += stats["num_hit"]
                num_det += stats["num_det"]
            n += 1
            if max_batches and n >= max_batches:
                break
        metrics = {
            "recall@0.5": hit_gt / max(total_gt, 1),
            "mean_detections": num_det / max(n * self.cfg.train.batch_size, 1),
        }
        # Full KITTI AP is the acceptance metric (BASELINE.json:2), so
        # it is ON by default; set eval_ap=false for recall-only speed.
        if self.cfg.model.params.get("eval_ap", True):
            from lisec_tpu.eval.kitti_ap import evaluate_pipeline_ap
            metrics.update(evaluate_pipeline_ap(
                self, state, split="val",
                max_frames=max_batches * self.cfg.train.batch_size
                if max_batches else 0))
        return metrics


register_model("second")(SECONDNet)


@register_pipeline("second")
class SECONDPipeline(PointPillarsPipeline):
    """Workload 4 — SECOND-style sparse-voxel detector (SURVEY.md M4).

    Same device program shape as PointPillars (voxelize -> encoder ->
    BEV RPN -> decode -> NMS) with the pillar encoder replaced by
    mean-VFE + the sparse 3D middle encoder (O7/O8). The anchor map
    sits on the 8x-downsampled BEV grid.
    """

    OUTPUT_STRIDE = 8

    def _model_args(self, batch):
        # Fused voxelize+mean-VFE paint (VERDICT r4 #4): per-voxel sums
        # painted directly (8 lanes/voxel) instead of the (P, K, C)
        # slot table whose output amplification bounded the old op.
        from lisec_tpu.ops.voxelize import voxelize_mean_batch

        cfg = self.cfg
        vox = voxelize_mean_batch(
            batch["points"], batch["point_mask"],
            pc_range=cfg.voxel.point_cloud_range,
            voxel_size=cfg.voxel.voxel_size,
            grid_size=self.grid,
            max_voxels=cfg.budget.max_voxels,
            max_points_per_voxel=cfg.budget.max_points_per_voxel)
        return (vox.feats, vox.coords, vox.num_points, vox.num_voxels)

    def build_model(self, cfg: Config):
        p = cfg.model.params
        self.fused = False
        budgets = tuple(p.get(
            "level_budgets",
            [cfg.budget.max_voxels, cfg.budget.max_voxels // 2,
             cfg.budget.max_voxels // 4, cfg.budget.max_voxels // 8]))
        return SECONDNet(
            num_classes=self.num_classes,
            grid_size=self.grid,
            num_anchors_per_cell=self.num_classes * 2,
            level_budgets=budgets,
            dense_from_level=int(p.get("dense_from_level", 2)),
            downsample=str(p.get("downsample", "dilate")),
            encoder_channels=tuple(p.get("encoder_channels",
                                         [16, 32, 64, 64])),
            bev_layers=tuple(p.get("bev_layers", [5, 5])),
            bev_filters=tuple(p.get("bev_filters", [128, 256])),
            bev_strides=tuple(p.get("bev_strides", [1, 2])),
            bev_up_strides=tuple(p.get("bev_up_strides", [1, 2])),
            bev_up_filters=tuple(p.get("bev_up_filters", [256, 256])),
            dtype=jnp.dtype(p.get("dtype", "float32")),
        )

"""Stage-3/4 integration: PointPillars pipeline — assigner sanity,
one train step, full jitted infer (voxelize -> ... -> NMS), and a short
learnability run (SURVEY.md §7 stages 3-4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import lisec_tpu
from lisec_tpu.config import apply_overrides, load_config


@pytest.fixture(scope="module")
def cfg():
    return load_config("configs/pointpillars_tiny.yaml")


@pytest.fixture(scope="module")
def pipeline(cfg):
    return lisec_tpu.build_model(cfg)


class TestAssigner:
    def test_perfect_anchor_is_positive(self, pipeline):
        from lisec_tpu.training.assigner import assign_targets
        anchors = pipeline.anchors
        # Use an actual anchor as the gt box -> IoU 1 -> positive.
        gt = np.zeros((4, 7), np.float32)
        gt[0] = np.asarray(anchors[137])
        gt_cls = np.zeros(4, np.int32)
        gt_mask = np.zeros(4, bool)
        gt_mask[0] = True
        res = assign_targets(
            anchors, pipeline.anchor_classes, pipeline.pos_thr,
            pipeline.neg_thr, jnp.asarray(gt), jnp.asarray(gt_cls),
            jnp.asarray(gt_mask))
        assert bool(res.positive[137])
        assert int(res.cls_targets[137]) == 1
        np.testing.assert_allclose(
            np.asarray(res.reg_targets[137]), 0.0, atol=1e-5)
        # Far-away anchors are background, not ignore.
        assert int(res.cls_targets[0]) == 0

    def test_empty_frame_all_background(self, pipeline):
        from lisec_tpu.training.assigner import assign_targets
        gt = np.zeros((4, 7), np.float32)
        res = assign_targets(
            pipeline.anchors, pipeline.anchor_classes, pipeline.pos_thr,
            pipeline.neg_thr, jnp.asarray(gt),
            jnp.zeros(4, jnp.int32), jnp.zeros(4, bool))
        assert not bool(res.positive.any())
        assert bool((res.cls_targets == 0).all())


class TestPointPillars:
    def test_train_step_and_infer(self, cfg, pipeline):
        state = pipeline.init_state(0)
        ds = pipeline.make_dataset("train")
        from lisec_tpu.data.collate import make_batches
        batch = next(make_batches(ds, cfg.budget, cfg.train.batch_size,
                                  shuffle=False))
        rng = jax.random.PRNGKey(0)
        state, aux = pipeline.train_step(state, batch, rng)
        assert np.isfinite(float(aux["loss"]))
        assert float(aux["num_pos"]) > 0   # fixture scenes have objects

        out = pipeline.infer(state, batch)
        b = cfg.train.batch_size
        assert out["boxes"].shape == (b, cfg.budget.nms_post, 7)
        assert out["scores"].shape == (b, cfg.budget.nms_post)
        assert out["labels"].shape == (b, cfg.budget.nms_post)

    def test_short_training_improves_recall(self, cfg):
        cfg = apply_overrides(cfg, ["train.num_steps=60",
                                    "data.fixture_size=16"])
        pipeline, state, history = lisec_tpu.train(cfg, progress=False)
        losses = [h["loss"] for h in history if "loss" in h]
        assert losses[-1] < losses[0]
        metrics = pipeline.evaluate(state, max_batches=2)
        assert metrics["mean_detections"] >= 0  # smoke: eval runs


class TestWindowedAssigner:
    """assign_targets_windowed must reproduce the dense assigner's
    loss-relevant outputs (cls_targets, positive, and reg/dir on
    positives) on realistic frames."""

    def _both(self, pipeline, gt, gt_cls, gt_mask, window=32):
        from lisec_tpu.training.assigner import (
            assign_targets, assign_targets_windowed,
            assign_targets_windowed_batched)
        args = (pipeline.anchors, pipeline.anchor_classes,
                pipeline.pos_thr, pipeline.neg_thr)
        dense = assign_targets(*args, jnp.asarray(gt),
                               jnp.asarray(gt_cls), jnp.asarray(gt_mask))
        win = assign_targets_windowed(
            *args, pipeline.class_sizes, pipeline.class_z,
            jnp.asarray(gt), jnp.asarray(gt_cls), jnp.asarray(gt_mask),
            feature_map_size=pipeline.fmap,
            pc_range=tuple(pipeline.cfg.voxel.point_cloud_range),
            window=min(window, min(pipeline.fmap)))
        # The batched sort+paint variant (the train-step hot path) must
        # also match; run the frame twice in one batch to exercise the
        # batch dim.
        bat = assign_targets_windowed_batched(
            *args, pipeline.class_sizes, pipeline.class_z,
            jnp.asarray(np.stack([gt, gt])),
            jnp.asarray(np.stack([gt_cls, gt_cls])),
            jnp.asarray(np.stack([gt_mask, gt_mask])),
            feature_map_size=pipeline.fmap,
            pc_range=tuple(pipeline.cfg.voxel.point_cloud_range),
            window=min(window, min(pipeline.fmap)))
        # The column-layout variant (what pipeline.loss consumes) must
        # carry the same targets, transposed.
        bat_c = assign_targets_windowed_batched(
            *args, pipeline.class_sizes, pipeline.class_z,
            jnp.asarray(np.stack([gt, gt])),
            jnp.asarray(np.stack([gt_cls, gt_cls])),
            jnp.asarray(np.stack([gt_mask, gt_mask])),
            feature_map_size=pipeline.fmap,
            pc_range=tuple(pipeline.cfg.voxel.point_cloud_range),
            window=min(window, min(pipeline.fmap)), cols=True)
        np.testing.assert_allclose(
            np.asarray(bat_c.reg_targets.transpose(0, 2, 1)),
            np.asarray(bat.reg_targets), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(bat_c.dir_targets),
                                      np.asarray(bat.dir_targets))
        np.testing.assert_array_equal(np.asarray(bat_c.cls_targets),
                                      np.asarray(bat.cls_targets))
        for i in range(2):
            np.testing.assert_array_equal(
                np.asarray(bat.positive[i]), np.asarray(win.positive))
            np.testing.assert_array_equal(
                np.asarray(bat.cls_targets[i]),
                np.asarray(win.cls_targets))
            pos = np.asarray(win.positive)
            np.testing.assert_allclose(
                np.asarray(bat.reg_targets[i])[pos],
                np.asarray(win.reg_targets)[pos], atol=1e-5)
            np.testing.assert_array_equal(
                np.asarray(bat.dir_targets[i])[pos],
                np.asarray(win.dir_targets)[pos])
        return dense, win

    def _check(self, dense, win):
        np.testing.assert_array_equal(
            np.asarray(dense.positive), np.asarray(win.positive))
        np.testing.assert_array_equal(
            np.asarray(dense.cls_targets), np.asarray(win.cls_targets))
        pos = np.asarray(dense.positive)
        np.testing.assert_allclose(
            np.asarray(dense.reg_targets)[pos],
            np.asarray(win.reg_targets)[pos], atol=1e-5)
        np.testing.assert_array_equal(
            np.asarray(dense.dir_targets)[pos],
            np.asarray(win.dir_targets)[pos])

    def test_random_frames_match_dense(self, pipeline, rng):
        pc = pipeline.cfg.voxel.point_cloud_range
        for _ in range(3):
            m = 8
            gt = np.zeros((m, 7), np.float32)
            gt[:, 0] = rng.uniform(pc[0] + 3, pc[3] - 3, m)
            gt[:, 1] = rng.uniform(pc[1] + 3, pc[4] - 3, m)
            gt[:, 2] = rng.uniform(-1.5, -0.5, m)
            gt[:, 3] = rng.uniform(3.2, 4.6, m)
            gt[:, 4] = rng.uniform(1.4, 1.9, m)
            gt[:, 5] = rng.uniform(1.4, 1.8, m)
            gt[:, 6] = rng.uniform(-np.pi, np.pi, m)
            gt_cls = np.zeros(m, np.int32)
            gt_mask = rng.random(m) > 0.3
            dense, win = self._both(pipeline, gt, gt_cls, gt_mask)
            self._check(dense, win)

    def test_perfect_anchor_and_edges(self, pipeline):
        anchors = np.asarray(pipeline.anchors)
        gt = np.zeros((4, 7), np.float32)
        gt[0] = anchors[137]          # exact anchor
        gt[1] = anchors[-2]           # grid corner
        gt_cls = np.zeros(4, np.int32)
        gt_mask = np.array([True, True, False, False])
        dense, win = self._both(pipeline, gt, gt_cls, gt_mask)
        self._check(dense, win)

    def test_empty_frame(self, pipeline):
        gt = np.zeros((4, 7), np.float32)
        dense, win = self._both(pipeline, gt, np.zeros(4, np.int32),
                                np.zeros(4, bool))
        self._check(dense, win)

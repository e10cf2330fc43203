"""Unit tests: L2 ops vs NumPy oracles (SURVEY.md §4 test pyramid, unit level)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lisec_tpu import ops
from tests.oracles import ops_np


def _cloud(rng, n=512, c=4, lo=(0, -20, -3), hi=(40, 20, 1)):
    pts = np.stack([
        rng.uniform(lo[0], hi[0], n),
        rng.uniform(lo[1], hi[1], n),
        rng.uniform(lo[2], hi[2], n),
        rng.uniform(0, 1, n),
    ], axis=-1)[:, :c].astype(np.float32)
    return pts


class TestVoxelize:
    RANGE = (0.0, -20.0, -3.0, 40.0, 20.0, 1.0)
    VSIZE = (0.5, 0.5, 4.0)
    GRID = (80, 80, 1)

    def _run(self, pts, mask, max_v=128, max_p=8):
        res = ops.voxelize(
            jnp.asarray(pts), jnp.asarray(mask),
            pc_range=self.RANGE, voxel_size=self.VSIZE, grid_size=self.GRID,
            max_voxels=max_v, max_points_per_voxel=max_p)
        ora = ops_np.voxelize_np(
            pts, mask, self.RANGE, self.VSIZE, self.GRID, max_v, max_p)
        return res, ora

    def test_matches_oracle(self, rng):
        pts = _cloud(rng, 512)
        mask = np.ones(512, bool)
        res, (v, c, npts, nv, pv) = self._run(pts, mask)
        assert int(res.num_voxels) == nv
        np.testing.assert_array_equal(np.asarray(res.coords), c)
        np.testing.assert_array_equal(np.asarray(res.num_points), npts)
        # Voxel values round-trip through the paint kernel's two-term
        # bf16 split routing: <= ~4e-6 relative (0.3 mm at KITTI
        # ranges). Coords/counts/ranks are exact.
        np.testing.assert_allclose(np.asarray(res.voxels), v,
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(res.point_voxel), pv)

    def test_empty_cloud(self):
        pts = np.zeros((64, 4), np.float32)
        mask = np.zeros(64, bool)
        res, _ = self._run(pts, mask)
        assert int(res.num_voxels) == 0
        assert np.all(np.asarray(res.point_voxel) == -1)

    def test_all_points_one_cell(self):
        pts = np.full((64, 4), 0.5, np.float32)
        mask = np.ones(64, bool)
        res, (v, c, npts, nv, pv) = self._run(pts, mask, max_p=8)
        assert int(res.num_voxels) == 1
        assert int(res.num_points[0]) == 8  # overflow dropped at budget
        np.testing.assert_array_equal(np.asarray(res.point_voxel), pv)

    def test_voxel_budget_overflow(self, rng):
        pts = _cloud(rng, 512)
        mask = np.ones(512, bool)
        res, (v, c, npts, nv, pv) = self._run(pts, mask, max_v=16)
        assert int(res.num_voxels) == 16
        np.testing.assert_array_equal(np.asarray(res.coords), c)

    def test_out_of_range_dropped(self):
        pts = np.array([[100.0, 0, 0, 0], [1.0, 1.0, 0.0, 0]], np.float32)
        pts = np.tile(pts, (4, 1))
        mask = np.ones(8, bool)
        res, (v, c, npts, nv, pv) = self._run(pts, mask)
        assert int(res.num_voxels) == 1
        np.testing.assert_array_equal(np.asarray(res.point_voxel), pv)

    @pytest.mark.parametrize("max_v,max_p", [(128, 8), (16, 4), (64, 1)])
    def test_fused_mean_matches_unfused(self, rng, max_v, max_p):
        """voxelize_mean == mean_vfe(voxelize) bit-for-policy: same
        budgets, same deterministic overflow, coords/counts exact."""
        from lisec_tpu.models.second import mean_vfe
        from lisec_tpu.ops.voxelize import voxelize_mean_batch

        pts = np.stack([_cloud(rng, 512) for _ in range(3)])
        # Row 0 of cloud 2 out of range; cloud 1 has masked padding.
        pts[2, 0, 0] = 1e4
        mask = np.ones((3, 512), bool)
        mask[1, 400:] = False
        res = ops.voxelize_batch(
            jnp.asarray(pts), jnp.asarray(mask),
            pc_range=self.RANGE, voxel_size=self.VSIZE,
            grid_size=self.GRID, max_voxels=max_v,
            max_points_per_voxel=max_p)
        ref_feats = mean_vfe(res.voxels, res.num_points)
        fused = voxelize_mean_batch(
            jnp.asarray(pts), jnp.asarray(mask),
            pc_range=self.RANGE, voxel_size=self.VSIZE,
            grid_size=self.GRID, max_voxels=max_v,
            max_points_per_voxel=max_p)
        np.testing.assert_array_equal(np.asarray(fused.num_voxels),
                                      np.asarray(res.num_voxels))
        np.testing.assert_array_equal(np.asarray(fused.num_points),
                                      np.asarray(res.num_points))
        np.testing.assert_array_equal(np.asarray(fused.coords),
                                      np.asarray(res.coords))
        np.testing.assert_allclose(np.asarray(fused.feats),
                                   np.asarray(ref_feats),
                                   rtol=2e-5, atol=2e-5)

    def test_fused_mean_empty_cloud(self):
        from lisec_tpu.ops.voxelize import voxelize_mean_batch

        pts = np.zeros((1, 64, 4), np.float32)
        fused = voxelize_mean_batch(
            jnp.asarray(pts), jnp.zeros((1, 64), bool),
            pc_range=self.RANGE, voxel_size=self.VSIZE,
            grid_size=self.GRID, max_voxels=16, max_points_per_voxel=4)
        assert int(fused.num_voxels[0]) == 0
        assert np.all(np.asarray(fused.coords) == -1)
        assert np.all(np.asarray(fused.feats) == 0)

    def test_overflow_multi_slab(self, rng):
        # Regression (round-2 ADVICE, high): with a multi-slab table
        # (max_voxels * K / 16 > 2048 — true for both KITTI configs) an
        # overflowing cell used to emit an out-of-band sentinel row
        # mid-stream, truncating every later slab's searchsorted range
        # and silently zeroing later voxels.
        n_cells = 3000
        cell_pts = np.stack([
            (np.arange(n_cells) % 80) * 0.5 + 0.25,
            (np.arange(n_cells) // 80) * 0.5 - 19.75,
            np.zeros(n_cells),
            np.full(n_cells, 0.5),
        ], axis=-1).astype(np.float32)
        overflow = np.tile(
            np.array([[0.25, -19.75, 0.0, 0.9]], np.float32), (400, 1))
        pts = np.concatenate([overflow, cell_pts[1:]], axis=0)
        mask = np.ones(len(pts), bool)
        res, (v, c, npts, nv, pv) = self._run(
            pts, mask, max_v=4096, max_p=16)
        assert int(res.num_voxels) == nv == n_cells
        np.testing.assert_array_equal(np.asarray(res.coords), c)
        np.testing.assert_array_equal(np.asarray(res.num_points), npts)
        np.testing.assert_allclose(np.asarray(res.voxels), v,
                                   rtol=2e-5, atol=2e-5)
        np.testing.assert_array_equal(np.asarray(res.point_voxel), pv)

    def test_five_channel_cloud(self, rng):
        # C > 4 packs 8 slots of 16 lanes per row (round-2 ADVICE, low:
        # the 8-lane record used to hard-assert C <= 4).
        pts4 = _cloud(rng, 256)
        pts = np.concatenate(
            [pts4, rng.integers(0, 64, (256, 1)).astype(np.float32)],
            axis=-1)
        mask = np.ones(256, bool)
        res, (v, c, npts, nv, pv) = self._run(pts, mask)
        assert int(res.num_voxels) == nv
        np.testing.assert_array_equal(np.asarray(res.coords), c)
        np.testing.assert_allclose(np.asarray(res.voxels), v,
                                   rtol=2e-5, atol=2e-5)


class TestFPS:
    def test_matches_oracle(self, rng):
        pts = _cloud(rng, 256, c=3)
        mask = np.ones(256, bool)
        got = np.asarray(ops.farthest_point_sampling(
            jnp.asarray(pts), jnp.asarray(mask), 32))
        want = ops_np.fps_np(pts, mask, 32)
        np.testing.assert_array_equal(got, want)

    def test_masked_points_never_selected(self, rng):
        pts = _cloud(rng, 256, c=3)
        mask = np.zeros(256, bool)
        mask[:50] = True
        got = np.asarray(ops.farthest_point_sampling(
            jnp.asarray(pts), jnp.asarray(mask), 32))
        assert np.all(got < 50)

    def test_more_samples_than_points(self, rng):
        pts = _cloud(rng, 64, c=3)
        mask = np.zeros(64, bool)
        mask[:5] = True
        got = np.asarray(ops.farthest_point_sampling(
            jnp.asarray(pts), jnp.asarray(mask), 16))
        assert np.all(got < 5)
        assert len(np.unique(got[:5])) == 5

    def test_batched(self, rng):
        pts = np.stack([_cloud(rng, 128, c=3) for _ in range(3)])
        mask = np.ones((3, 128), bool)
        got = np.asarray(ops.farthest_point_sampling(
            jnp.asarray(pts), jnp.asarray(mask), 16))
        for b in range(3):
            np.testing.assert_array_equal(
                got[b], ops_np.fps_np(pts[b], mask[b], 16))


class TestBallQuery:
    def test_matches_oracle(self, rng):
        pts = _cloud(rng, 256, c=3, lo=(0, 0, 0), hi=(4, 4, 4))
        centers = pts[:32]
        mask = np.ones(256, bool)
        got = np.asarray(ops.ball_query(
            jnp.asarray(centers), jnp.asarray(pts), jnp.asarray(mask),
            radius=0.8, num_neighbors=16))
        want = ops_np.ball_query_np(centers, pts, mask, 0.8, 16)
        np.testing.assert_array_equal(got, want)

    def test_empty_ball(self, rng):
        pts = np.zeros((8, 3), np.float32)
        centers = np.full((2, 3), 100.0, np.float32)
        mask = np.ones(8, bool)
        got = np.asarray(ops.ball_query(
            jnp.asarray(centers), jnp.asarray(pts), jnp.asarray(mask),
            radius=0.5, num_neighbors=4))
        assert np.all(got == 0)

    def test_approx_branch_parity(self, rng):
        # The TPU build takes the approx_max_k branch, which CPU tests
        # never hit by default (ADVICE r3). Force it here: same wiring,
        # shapes, and repeat-fill semantics; assert bounded recall loss
        # vs the exact branch (exact fallback off-device -> recall 1.0,
        # but the device branch's recall_target is the contract).
        pts = _cloud(rng, 512, c=3, lo=(0, 0, 0), hi=(4, 4, 4))
        centers = pts[:64]
        mask = np.ones(512, bool)
        kw = dict(radius=0.8, num_neighbors=16)
        exact = np.asarray(ops.ball_query(
            jnp.asarray(centers), jnp.asarray(pts), jnp.asarray(mask),
            force_approx=False, **kw))
        approx = np.asarray(ops.ball_query(
            jnp.asarray(centers), jnp.asarray(pts), jnp.asarray(mask),
            force_approx=True, **kw))
        assert approx.shape == exact.shape
        assert approx.dtype == exact.dtype
        # Per-center recall of the exact neighbor set.
        recalls = [
            len(set(a) & set(e)) / max(len(set(e)), 1)
            for a, e in zip(approx, exact)]
        assert np.mean(recalls) >= 0.95


class TestThreeNN:
    def test_matches_oracle(self, rng):
        q = _cloud(rng, 64, c=3)
        s = _cloud(rng, 32, c=3)
        smask = np.ones(32, bool)
        d2, idx = ops.three_nn(jnp.asarray(q), jnp.asarray(s),
                               jnp.asarray(smask))
        wd2, widx = ops_np.three_nn_np(q, s, smask)
        np.testing.assert_allclose(np.asarray(d2), wd2, rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idx), widx)

    def test_interpolate(self, rng):
        q = _cloud(rng, 64, c=3)
        s = _cloud(rng, 32, c=3)
        feats = rng.normal(size=(32, 16)).astype(np.float32)
        smask = np.ones(32, bool)
        d2, idx = ops.three_nn(jnp.asarray(q), jnp.asarray(s),
                               jnp.asarray(smask))
        got = np.asarray(ops.three_interpolate(jnp.asarray(feats), idx, d2))
        want = ops_np.three_interpolate_np(feats, np.asarray(idx),
                                           np.asarray(d2))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_grad_flows(self, rng):
        s = jnp.asarray(_cloud(rng, 32, c=3))
        q = jnp.asarray(_cloud(rng, 64, c=3))
        feats = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
        smask = jnp.ones(32, bool)

        def f(feats):
            d2, idx = ops.three_nn(q, s, smask)
            return jnp.sum(ops.three_interpolate(feats, idx, d2) ** 2)

        g = jax.grad(f)(feats)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


class TestRotatedIoU:
    def test_identical_boxes(self):
        b = jnp.asarray([[0, 0, 0, 4, 2, 1.5, 0.3]], jnp.float32)
        iou = np.asarray(ops.rotated_iou_bev(b, b))
        np.testing.assert_allclose(iou, [1.0], atol=1e-5)

    def test_disjoint(self):
        a = jnp.asarray([0, 0, 0, 2, 2, 1, 0.0], jnp.float32)
        b = jnp.asarray([10, 10, 0, 2, 2, 1, 0.7], jnp.float32)
        assert float(ops.rotated_iou_bev(a, b)) == 0.0

    def test_axis_aligned_halves(self):
        a = jnp.asarray([0, 0, 0, 2, 2, 1, 0.0], jnp.float32)
        b = jnp.asarray([1, 0, 0, 2, 2, 1, 0.0], jnp.float32)
        np.testing.assert_allclose(float(ops.rotated_iou_bev(a, b)),
                                   1 / 3, atol=1e-5)

    def test_random_vs_oracle(self, rng):
        n = 64
        boxes_a = np.stack([
            rng.uniform(-5, 5, n), rng.uniform(-5, 5, n), np.zeros(n),
            rng.uniform(1, 5, n), rng.uniform(1, 4, n), np.ones(n),
            rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
        boxes_b = np.stack([
            rng.uniform(-5, 5, n), rng.uniform(-5, 5, n), np.zeros(n),
            rng.uniform(1, 5, n), rng.uniform(1, 4, n), np.ones(n),
            rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
        got = np.asarray(ops.rotated_iou_bev(
            jnp.asarray(boxes_a), jnp.asarray(boxes_b)))
        want = np.array([ops_np.rotated_iou_np(a, b)
                         for a, b in zip(boxes_a, boxes_b)])
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_yaw_wrap(self):
        a = jnp.asarray([0, 0, 0, 4, 2, 1, np.pi - 0.01], jnp.float32)
        b = jnp.asarray([0, 0, 0, 4, 2, 1, -np.pi + 0.01], jnp.float32)
        assert float(ops.rotated_iou_bev(a, b)) > 0.95

    def test_identical_random_poses(self, rng):
        # Self-IoU must be exactly 1 at arbitrary pose — on-boundary
        # corners far from the origin stress the eps predicates.
        n = 32
        b = np.stack([
            rng.uniform(-50, 50, n), rng.uniform(-50, 50, n), np.zeros(n),
            rng.uniform(1, 5, n), rng.uniform(1, 4, n), np.ones(n),
            rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
        iou = np.asarray(ops.rotated_iou_bev(jnp.asarray(b), jnp.asarray(b)))
        np.testing.assert_allclose(iou, np.ones(n), atol=1e-5)

    def test_touching_far_from_origin(self):
        # Edge-touching boxes have IoU 0 regardless of where they sit
        # (the area computation must be translation invariant).
        for ofs in [(0.0, 0.0), (37.5, -21.25), (-60.0, 33.0)]:
            a = jnp.asarray([ofs[0], ofs[1], 0, 2, 2, 1, 0.0], jnp.float32)
            b = jnp.asarray([ofs[0] + 2, ofs[1], 0, 2, 2, 1, 0.0],
                            jnp.float32)
            assert abs(float(ops.rotated_iou_bev(a, b))) < 1e-5

    def test_contained_box(self):
        a = jnp.asarray([10, -5, 0, 8, 6, 1, 0.4], jnp.float32)
        b = jnp.asarray([10, -5, 0, 2, 1, 1, 0.4], jnp.float32)
        np.testing.assert_allclose(
            float(ops.rotated_iou_bev(a, b)), 2.0 / 48.0, atol=1e-5)

    def test_parallel_same_yaw_overlap(self, rng):
        # Same-yaw pairs keep edge lines parallel/collinear — the
        # enumeration must neither double count nor drop their vertices.
        for _ in range(20):
            yaw = float(rng.uniform(-np.pi, np.pi))
            x = float(rng.uniform(-30, 30))
            a = np.array([x, 3.0, 0, 4, 2, 1, yaw], np.float32)
            bshift = np.array([1.3, 0, 0, 0, 0, 0, 0], np.float32)
            b = a + bshift
            got = float(ops.rotated_iou_bev(jnp.asarray(a), jnp.asarray(b)))
            want = ops_np.rotated_iou_np(a, b)
            np.testing.assert_allclose(got, want, atol=2e-4)


class TestNMS:
    def test_matches_oracle(self, rng):
        n = 64
        boxes = np.stack([
            rng.uniform(-10, 10, n), rng.uniform(-10, 10, n), np.zeros(n),
            rng.uniform(2, 5, n), rng.uniform(1, 3, n), np.ones(n),
            rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        labels = rng.integers(0, 3, n).astype(np.int32)
        res = ops.rotated_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
            iou_threshold=0.3, score_threshold=0.1, nms_pre=64, nms_post=32)
        want_keep = ops_np.nms_np(boxes, scores, labels, 0.3, 0.1)
        got_valid = np.asarray(res.valid)
        got_scores = np.asarray(res.scores)[got_valid]
        want_scores = np.sort(scores[want_keep])[::-1][:32]
        np.testing.assert_allclose(np.sort(got_scores)[::-1], want_scores,
                                   rtol=1e-6)

    def test_matches_oracle_dense_multiround(self, rng):
        # Dense overlapping scene: exercises several block-greedy rounds,
        # in-block suppression chains, and the nms_post emission cap.
        n = 256
        boxes = np.stack([
            rng.uniform(-8, 8, n), rng.uniform(-8, 8, n), np.zeros(n),
            rng.uniform(2, 6, n), rng.uniform(1, 4, n), np.ones(n),
            rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        labels = rng.integers(0, 2, n).astype(np.int32)
        res = ops.rotated_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
            iou_threshold=0.2, score_threshold=0.05, nms_pre=256,
            nms_post=24)
        want_keep = ops_np.nms_np(boxes, scores, labels, 0.2, 0.05)[:24]
        got_valid = np.asarray(res.valid)
        got_scores = np.asarray(res.scores)[got_valid]
        want_scores = np.sort(scores[want_keep])[::-1]
        np.testing.assert_allclose(np.sort(got_scores)[::-1], want_scores,
                                   rtol=1e-6)

    def test_scan_select_matches_topk(self, rng):
        # The cumsum block-select must be bit-identical to the masked
        # top_k select (candidates are score-sorted, so "top block
        # alive" == "first block alive"), on a dense multi-round scene,
        # both with and without the k_near compaction.
        n = 256
        boxes = np.stack([
            rng.uniform(-8, 8, n), rng.uniform(-8, 8, n), np.zeros(n),
            rng.uniform(2, 6, n), rng.uniform(1, 4, n), np.ones(n),
            rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        labels = rng.integers(0, 2, n).astype(np.int32)
        kw = dict(iou_threshold=0.2, score_threshold=0.05,
                  nms_pre=256, nms_post=24)
        for k_near in (0, 16):
            a = ops.rotated_nms(
                jnp.asarray(boxes), jnp.asarray(scores),
                jnp.asarray(labels), select="topk", k_near=k_near, **kw)
            b = ops.rotated_nms(
                jnp.asarray(boxes), jnp.asarray(scores),
                jnp.asarray(labels), select="scan", k_near=k_near, **kw)
            np.testing.assert_array_equal(np.asarray(a.valid),
                                          np.asarray(b.valid))
            np.testing.assert_array_equal(np.asarray(a.scores),
                                          np.asarray(b.scores))
            np.testing.assert_array_equal(np.asarray(a.boxes),
                                          np.asarray(b.boxes))

    def test_k_near_compaction_matches_full(self, rng):
        # Spread scene: few same-class candidates inside any circle
        # bound, so the compacted path (k_near=16) must be exactly the
        # full-row result.
        n = 160
        boxes = np.stack([
            rng.uniform(-40, 40, n), rng.uniform(-40, 40, n), np.zeros(n),
            rng.uniform(2, 5, n), rng.uniform(1, 3, n), np.ones(n),
            rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        labels = rng.integers(0, 3, n).astype(np.int32)
        kw = dict(iou_threshold=0.3, score_threshold=0.1,
                  nms_pre=160, nms_post=64)
        a = ops.rotated_nms(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(labels), k_near=16, **kw)
        b = ops.rotated_nms(jnp.asarray(boxes), jnp.asarray(scores),
                            jnp.asarray(labels), k_near=0, **kw)
        np.testing.assert_array_equal(np.asarray(a.valid),
                                      np.asarray(b.valid))
        np.testing.assert_allclose(np.asarray(a.scores),
                                   np.asarray(b.scores))
        want_keep = ops_np.nms_np(boxes, scores, labels, 0.3, 0.1)[:64]
        got_scores = np.asarray(a.scores)[np.asarray(a.valid)]
        np.testing.assert_allclose(
            np.sort(got_scores)[::-1],
            np.sort(scores[want_keep])[::-1], rtol=1e-6)

    def test_class_parallel_matches_single_stream(self, rng):
        # Per-class vmapped streams merged by score must equal the one
        # global greedy stream exactly (classes never suppress each
        # other; emissions are score-descending in both forms, and
        # random float scores have no cross-class ties). Dense scene so
        # every stream runs several rounds and the nms_post cap binds.
        n = 256
        boxes = np.stack([
            rng.uniform(-8, 8, n), rng.uniform(-8, 8, n), np.zeros(n),
            rng.uniform(2, 6, n), rng.uniform(1, 4, n), np.ones(n),
            rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        labels = rng.integers(0, 3, n).astype(np.int32)
        for k_near, post in ((0, 24), (16, 24), (0, 128)):
            kw = dict(iou_threshold=0.2, score_threshold=0.05,
                      nms_pre=256, nms_post=post, k_near=k_near)
            a = ops.rotated_nms(
                jnp.asarray(boxes), jnp.asarray(scores),
                jnp.asarray(labels), class_parallel=3, **kw)
            b = ops.rotated_nms(
                jnp.asarray(boxes), jnp.asarray(scores),
                jnp.asarray(labels), class_parallel=0, **kw)
            np.testing.assert_array_equal(np.asarray(a.valid),
                                          np.asarray(b.valid))
            np.testing.assert_array_equal(np.asarray(a.scores),
                                          np.asarray(b.scores))
            np.testing.assert_array_equal(np.asarray(a.boxes),
                                          np.asarray(b.boxes))
            np.testing.assert_array_equal(np.asarray(a.labels),
                                          np.asarray(b.labels))

    def test_block_size_invariance(self, rng):
        n = 96
        boxes = np.stack([
            rng.uniform(-6, 6, n), rng.uniform(-6, 6, n), np.zeros(n),
            rng.uniform(2, 5, n), rng.uniform(1, 3, n), np.ones(n),
            rng.uniform(-np.pi, np.pi, n)], -1).astype(np.float32)
        scores = rng.uniform(0, 1, n).astype(np.float32)
        labels = np.zeros(n, np.int32)
        outs = [ops.rotated_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(labels),
            iou_threshold=0.3, score_threshold=0.1, nms_pre=96,
            nms_post=48, block=blk) for blk in (1, 7, 16, 96)]
        for res in outs[1:]:
            np.testing.assert_array_equal(
                np.asarray(res.valid), np.asarray(outs[0].valid))
            np.testing.assert_allclose(
                np.asarray(res.scores), np.asarray(outs[0].scores))

    def test_suppresses_duplicates(self):
        box = [0, 0, 0, 4, 2, 1.5, 0.2]
        boxes = jnp.asarray([box, box, box], jnp.float32)
        scores = jnp.asarray([0.9, 0.8, 0.7])
        labels = jnp.zeros(3, jnp.int32)
        res = ops.rotated_nms(boxes, scores, labels, iou_threshold=0.5,
                              nms_pre=3, nms_post=3)
        assert int(np.asarray(res.valid).sum()) == 1
        assert float(res.scores[0]) == pytest.approx(0.9)


class TestBoxes:
    def test_encode_decode_roundtrip(self, rng):
        n = 32
        anchors = np.stack([
            rng.uniform(-10, 10, n), rng.uniform(-10, 10, n),
            rng.uniform(-2, 0, n), np.full(n, 3.9), np.full(n, 1.6),
            np.full(n, 1.56), np.zeros(n)], -1).astype(np.float32)
        boxes = anchors + rng.normal(0, 0.1, anchors.shape).astype(np.float32)
        enc = ops.encode_boxes(jnp.asarray(boxes), jnp.asarray(anchors))
        dec = np.asarray(ops.decode_boxes(enc, jnp.asarray(anchors)))
        np.testing.assert_allclose(dec, boxes, rtol=1e-3, atol=1e-3)

    def test_points_in_rbbox(self):
        boxes = jnp.asarray([[0, 0, 0, 4, 2, 2, np.pi / 2]], jnp.float32)
        pts = jnp.asarray([
            [0, 0, 0], [0, 1.9, 0], [1.9, 0, 0], [0.9, 0, 0], [0, 0, 1.1],
        ], jnp.float32)
        got = np.asarray(ops.points_in_rbbox(pts, boxes))[:, 0]
        # yaw=pi/2 swaps l and w: box extends +-1 in x, +-2 in y.
        np.testing.assert_array_equal(got, [True, True, False, True, False])


class TestRangeProjection:
    H, W = 16, 128

    def test_matches_oracle(self, rng):
        pts = _cloud(rng, 256, c=4, lo=(1, -10, -2), hi=(30, 10, 1))
        mask = np.ones(256, bool)
        res = ops.range_project(jnp.asarray(pts), jnp.asarray(mask),
                                height=self.H, width=self.W)
        img, imask, uv = ops_np.range_project_np(pts, mask, self.H, self.W,
                                                 3.0, -25.0)
        np.testing.assert_array_equal(np.asarray(res.image_mask), imask)
        np.testing.assert_array_equal(np.asarray(res.pixel_uv), uv)
        np.testing.assert_allclose(np.asarray(res.image), img, rtol=1e-5,
                                   atol=1e-5)

    def test_unproject_roundtrip(self, rng):
        pts = _cloud(rng, 64, c=4, lo=(1, -10, -2), hi=(30, 10, 1))
        mask = np.ones(64, bool)
        res = ops.range_project(jnp.asarray(pts), jnp.asarray(mask),
                                height=self.H, width=self.W)
        vals = ops.range_unproject(res.image[..., 0], res.pixel_uv)
        # Each point reads back a range <= its own (the pixel winner's).
        assert np.all(np.asarray(vals) <= np.asarray(res.point_range) + 1e-5)



    def test_batch_matches_vmapped_reference(self, rng):
        """range_project_batch (sort+paint O12) must be output-identical
        to the two-scatter reference, including winner tie-breaks and
        padding handling."""
        import jax
        from lisec_tpu.ops.range_proj import range_project_batch
        B, N = 3, 512
        pts = np.stack([_cloud(rng, N, c=4, lo=(1, -10, -2),
                               hi=(30, 10, 1)) for _ in range(B)])
        mask = rng.random((B, N)) > 0.2
        # Duplicate some points so min-range ties exercise the
        # lowest-index tie-break.
        pts[:, 100:140] = pts[:, 60:100]
        ref = jax.vmap(lambda p, m: ops.range_project(
            p, m, height=self.H, width=self.W))(
                jnp.asarray(pts), jnp.asarray(mask))
        out = range_project_batch(
            jnp.asarray(pts), jnp.asarray(mask), height=self.H,
            width=self.W, interpret=True)
        np.testing.assert_array_equal(np.asarray(out.image_mask),
                                      np.asarray(ref.image_mask))
        np.testing.assert_array_equal(np.asarray(out.winner_idx),
                                      np.asarray(ref.winner_idx))
        np.testing.assert_array_equal(np.asarray(out.pixel_uv),
                                      np.asarray(ref.pixel_uv))
        np.testing.assert_allclose(np.asarray(out.point_range),
                                   np.asarray(ref.point_range), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(out.image),
                                   np.asarray(ref.image),
                                   rtol=1e-5, atol=1e-5)


class TestKNNRefine:
    def test_single_class_stays(self, rng):
        pts = _cloud(rng, 128, c=4, lo=(1, -10, -2), hi=(30, 10, 1))
        mask = np.ones(128, bool)
        res = ops.range_project(jnp.asarray(pts), jnp.asarray(mask),
                                height=16, width=128)
        labels_img = jnp.full((16, 128), 3, jnp.int32)
        out = ops.knn_refine(
            res.point_range, res.pixel_uv, res.image[..., 0], labels_img,
            res.image_mask, num_classes=8)
        assert np.all(np.asarray(out) == 3)


class TestSparseConv:
    GRID = (8, 16, 16)

    def _coords(self, rng, v_budget, n_active):
        # Unique sorted-by-linid coords, valid rows first.
        nz, ny, nx = self.GRID
        lin = rng.choice(nz * ny * nx, size=n_active, replace=False)
        lin = np.sort(lin)
        coords = np.stack([lin // (ny * nx), (lin // nx) % ny, lin % nx],
                          -1).astype(np.int32)
        pad = np.full((v_budget - n_active, 3), -1, np.int32)
        return np.concatenate([coords, pad])

    def test_submanifold_matches_oracle(self, rng):
        v, n_act, cin, cout = 64, 40, 8, 12
        coords = self._coords(rng, v, n_act)
        feats = rng.normal(size=(v, cin)).astype(np.float32)
        feats[n_act:] = 0
        w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        spec = ops.SparseConvSpec((3, 3, 3), (1, 1, 1), (1, 1, 1), self.GRID)
        rb = ops.build_rulebook(
            jnp.asarray(coords), jnp.asarray(n_act),
            jnp.asarray(coords), jnp.asarray(n_act), spec)
        got = np.asarray(ops.sparse_conv3d(
            jnp.asarray(feats), rb, jnp.asarray(w)))
        want = ops_np.sparse_conv3d_np(
            coords[:n_act], feats[:n_act], n_act, w, (3, 3, 3), (1, 1, 1),
            (1, 1, 1), self.GRID)
        for o in range(n_act):
            key = tuple(coords[o])
            np.testing.assert_allclose(got[o], want.get(key, 0.0),
                                       rtol=1e-4, atol=1e-4)

    def test_strided_output_coords_and_conv(self, rng):
        v, n_act, cin, cout = 64, 40, 8, 12
        coords = self._coords(rng, v, n_act)
        feats = rng.normal(size=(v, cin)).astype(np.float32)
        feats[n_act:] = 0
        w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        spec = ops.SparseConvSpec((3, 3, 3), (2, 2, 2), (1, 1, 1), self.GRID)
        out_coords, num_out = ops.build_output_coords(
            jnp.asarray(coords), jnp.asarray(n_act), spec, max_out=128)
        rb = ops.build_rulebook(
            jnp.asarray(coords), jnp.asarray(n_act), out_coords, num_out,
            spec)
        got = np.asarray(ops.sparse_conv3d(jnp.asarray(feats), rb,
                                           jnp.asarray(w)))
        want = ops_np.sparse_conv3d_np(
            coords[:n_act], feats[:n_act], n_act, w, (3, 3, 3), (2, 2, 2),
            (1, 1, 1), self.GRID)
        oc = np.asarray(out_coords)
        no = int(num_out)
        assert no == len(want)
        assert set(map(tuple, oc[:no])) == set(want)
        for o in range(no):
            np.testing.assert_allclose(got[o], want[tuple(oc[o])],
                                       rtol=1e-4, atol=1e-4)

    def test_grad_flows(self, rng):
        v, n_act, cin, cout = 32, 20, 4, 6
        coords = self._coords(rng, v, n_act)
        feats = jnp.asarray(rng.normal(size=(v, cin)).astype(np.float32))
        w = jnp.asarray(rng.normal(size=(27, cin, cout)).astype(np.float32))
        spec = ops.SparseConvSpec((3, 3, 3), (1, 1, 1), (1, 1, 1), self.GRID)
        rb = ops.build_rulebook(jnp.asarray(coords), jnp.asarray(n_act),
                                jnp.asarray(coords), jnp.asarray(n_act), spec)

        def f(feats, w):
            return jnp.sum(ops.sparse_conv3d(feats, rb, w) ** 2)

        gf, gw = jax.grad(f, argnums=(0, 1))(feats, w)
        assert np.isfinite(np.asarray(gf)).all()
        assert np.isfinite(np.asarray(gw)).all()


class TestPillarScatter:
    def test_scatter_roundtrip(self, rng):
        p, c, ny, nx = 16, 8, 8, 8
        feats = rng.normal(size=(p, c)).astype(np.float32)
        ys = rng.choice(ny * nx, p, replace=False)
        coords = np.stack([np.zeros(p), ys // nx, ys % nx], -1).astype(np.int32)
        canvas = np.asarray(ops.pillar_scatter(
            jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(10),
            ny=ny, nx=nx))
        for i in range(10):
            np.testing.assert_allclose(
                canvas[:, coords[i, 1], coords[i, 2]], feats[i])
        # Invalid pillars (rank >= num_voxels) must not write.
        for i in range(10, p):
            np.testing.assert_allclose(
                canvas[:, coords[i, 1], coords[i, 2]], 0.0)


class TestNumericalGradients:
    """SURVEY.md §4: jax.test_util.check_grads for the custom-gradient
    ops (O4/O5/O8) and the fused pillar encoder — finite-difference
    agreement, not just finite/nonzero."""

    def test_group_points_grads(self, rng):
        from jax.test_util import check_grads
        feats = jnp.asarray(rng.normal(size=(32, 8)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 32, (6, 4)).astype(np.int32))

        def f(feats):
            return jnp.sum(jnp.tanh(ops.group_points(feats, idx)))
        check_grads(f, (feats,), order=2, modes=["rev"],
                    atol=1e-2, rtol=1e-2)

    def test_three_interpolate_grads(self, rng):
        from jax.test_util import check_grads
        q = jnp.asarray(_cloud(rng, 16, c=3))
        s = jnp.asarray(_cloud(rng, 12, c=3))
        smask = jnp.ones(12, bool)
        d2, idx = ops.three_nn(q, s, smask)
        feats = jnp.asarray(rng.normal(size=(12, 8)).astype(np.float32))

        def f(feats):
            return jnp.sum(jnp.tanh(ops.three_interpolate(feats, idx, d2)))
        check_grads(f, (feats,), order=2, modes=["rev"],
                    atol=1e-2, rtol=1e-2)

    def test_sparse_conv_grads(self, rng):
        from jax.test_util import check_grads
        grid = (8, 8, 8)
        n_act = 12
        lin = np.sort(rng.choice(8 * 8 * 8, n_act, replace=False))
        coords = np.stack([lin // 64, (lin // 8) % 8, lin % 8],
                          -1).astype(np.int32)
        coords = np.concatenate(
            [coords, np.full((4, 3), -1, np.int32)])
        feats = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(27, 4, 6)).astype(np.float32) * 0.3)
        spec = ops.SparseConvSpec((3, 3, 3), (1, 1, 1), (1, 1, 1), grid)
        rb = ops.build_rulebook(jnp.asarray(coords), jnp.asarray(n_act),
                                jnp.asarray(coords), jnp.asarray(n_act),
                                spec)

        def f(feats, w):
            return jnp.sum(jnp.tanh(ops.sparse_conv3d(feats, rb, w)))
        check_grads(f, (feats, w), order=2, modes=["rev"],
                    atol=1e-2, rtol=1e-2)

    def test_fused_encoder_grads(self, rng):
        from jax.test_util import check_grads
        from lisec_tpu.models.pillar_encoder import FusedPillarEncoder

        enc = FusedPillarEncoder(
            num_filters=8, grid=(16, 16),
            pc_range=(0.0, -5.12, -3.0, 2.56, 5.12, 1.0),
            voxel_size=(0.16, 0.64), dtype=jnp.float32)
        pts = rng.uniform([-0.5, -6, -4, 0], [3, 6, 2, 1],
                          (1, 128, 4)).astype(np.float32)
        mask = np.ones((1, 128), bool)
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                     jnp.asarray(mask))

        def f(kernel):
            params = {**v["params"], "kernel": kernel}
            out, _ = enc.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                jnp.asarray(pts), jnp.asarray(mask), train=True,
                mutable=["batch_stats"])
            return jnp.sum(jnp.tanh(out))
        check_grads(f, (v["params"]["kernel"],), order=1, modes=["rev"],
                    atol=2e-2, rtol=2e-2)


class TestScatterRulebookSpread:
    """Scatter-form rulebook + spread conv must reproduce the gather-
    form sparse conv (which is itself oracle-tested)."""

    GRID = (8, 12, 12)

    def _coords(self, rng, v_budget, n_active):
        nz, ny, nx = self.GRID
        lin = np.sort(rng.choice(nz * ny * nx, n_active, replace=False))
        coords = np.stack(
            [lin // (ny * nx), (lin // nx) % ny, lin % nx],
            -1).astype(np.int32)
        pad = np.full((v_budget - n_active, 3), -1, np.int32)
        return np.concatenate([coords, pad])

    def _compare(self, rng, spec, out_coords_fn):
        b, v, n_act, cin, cout = 2, 64, 40, 8, 12
        coords = np.stack([self._coords(rng, v, n_act) for _ in range(b)])
        feats = rng.normal(size=(b, v, cin)).astype(np.float32)
        feats[:, n_act:] = 0
        w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        nums = np.full((b,), n_act, np.int32)

        out_coords, out_nums = out_coords_fn(coords, nums, spec)
        want = np.stack([np.asarray(ops.sparse_conv3d(
            jnp.asarray(feats[i]),
            ops.build_rulebook(
                jnp.asarray(coords[i]), jnp.asarray(nums[i]),
                jnp.asarray(out_coords[i]), jnp.asarray(out_nums[i]),
                spec),
            jnp.asarray(w))) for i in range(b)])

        srb = ops.build_scatter_rulebook(
            jnp.asarray(coords), jnp.asarray(nums),
            jnp.asarray(out_coords), jnp.asarray(out_nums), spec)
        got = np.asarray(ops.sparse_conv3d_spread(
            jnp.asarray(feats), srb, jnp.asarray(w),
            v_out=out_coords.shape[1], interpret=True))
        # valid rows only
        for i in range(b):
            no = int(out_nums[i])
            np.testing.assert_allclose(got[i, :no], want[i, :no],
                                       rtol=2e-4, atol=2e-4)

    def test_submanifold(self, rng):
        spec = ops.SparseConvSpec((3, 3, 3), (1, 1, 1), (1, 1, 1),
                                  self.GRID)
        self._compare(rng, spec,
                      lambda c, n, s: (c, n))

    def test_subm_mirror_builder_equals_general(self, rng):
        """build_subm_scatter_rulebook (13 merges + identity center +
        paint-inverted mirrors) must equal the 27-merge general
        builder, including ragged valid counts."""
        from lisec_tpu.ops.sparse_conv import build_subm_scatter_rulebook
        spec = ops.SparseConvSpec((3, 3, 3), (1, 1, 1), (1, 1, 1),
                                  self.GRID)
        b, v = 3, 64
        n_act = [40, 17, 64]
        coords = np.stack([self._coords(rng, v, n) for n in n_act])
        nums = np.asarray(n_act, np.int32)
        want = np.asarray(ops.build_scatter_rulebook(
            jnp.asarray(coords), jnp.asarray(nums),
            jnp.asarray(coords), jnp.asarray(nums), spec))
        got = np.asarray(build_subm_scatter_rulebook(
            jnp.asarray(coords), jnp.asarray(nums), spec))
        np.testing.assert_array_equal(got, want)

    def test_strided(self, rng):
        spec = ops.SparseConvSpec((3, 3, 3), (2, 2, 2), (1, 1, 1),
                                  self.GRID)

        def mk_out(c, n, s):
            ocs, ons = [], []
            for i in range(len(c)):
                oc, on = ops.build_output_coords(
                    jnp.asarray(c[i]), jnp.asarray(n[i]), s, max_out=64)
                ocs.append(np.asarray(oc))
                ons.append(int(on))
            return np.stack(ocs), np.asarray(ons, np.int32)
        self._compare(rng, spec, mk_out)

    def test_spread_conv_grads_match_gather_form(self, rng):
        from jax.test_util import check_grads
        spec = ops.SparseConvSpec((3, 3, 3), (1, 1, 1), (1, 1, 1),
                                  self.GRID)
        b, v, n_act, cin, cout = 1, 32, 20, 4, 6
        coords = np.stack([self._coords(rng, v, n_act)])
        feats = jnp.asarray(
            rng.normal(size=(b, v, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2)
        nums = jnp.asarray([n_act], jnp.int32)
        srb = ops.build_scatter_rulebook(
            jnp.asarray(coords), nums, jnp.asarray(coords), nums, spec)

        def f(feats, w):
            y = ops.sparse_conv3d_spread(feats, srb, w, v_out=v,
                                         interpret=True)
            return jnp.sum(jnp.tanh(y))
        check_grads(f, (feats, w), order=1, modes=["rev"],
                    atol=2e-2, rtol=2e-2)


class TestKNNRefineEquivalence:
    """The sort+spread+fill refinement must reproduce the direct
    per-point windowed-gather reference on random scenes."""

    def _reference(self, point_range, pixel_uv, image_range,
                   image_labels, image_mask, window, k, num_classes,
                   cutoff=1.0):
        h, w = image_range.shape
        half = window // 2
        n = len(point_range)
        out = np.zeros(n, np.int32)
        for i in range(n):
            v0, u0 = pixel_uv[i]
            cand = []
            for dv in range(-half, half + 1):
                for du in range(-half, half + 1):
                    v = min(max(v0 + dv, 0), h - 1)
                    u = min(max(u0 + du, 0), w - 1)
                    if not image_mask[v, u]:
                        continue
                    d = abs(image_range[v, u] - point_range[i])
                    if d < cutoff:
                        cand.append((d, image_labels[v, u]))
            cand.sort(key=lambda x: x[0])
            cand = cand[:k]
            if not cand:
                out[i] = image_labels[v0, u0]
                continue
            votes = np.zeros(num_classes)
            for d, l in cand:
                votes[l] += 1.0 / (d + 1e-3)
            out[i] = int(np.argmax(votes))
        return out

    def test_matches_reference(self, rng):
        h, w, n, nc = 16, 64, 256, 8
        img_r = rng.uniform(1, 30, (h, w)).astype(np.float32)
        img_l = rng.integers(0, nc, (h, w)).astype(np.int32)
        img_m = rng.random((h, w)) > 0.2
        uv = np.stack([rng.integers(0, h, n), rng.integers(0, w, n)],
                      -1).astype(np.int32)
        # point ranges near their pixel's range (plus some outliers)
        pr = (img_r[uv[:, 0], uv[:, 1]]
              + rng.normal(0, 0.3, n)).astype(np.float32)
        pr[::13] += 10.0

        got = np.asarray(ops.knn_refine(
            jnp.asarray(pr), jnp.asarray(uv), jnp.asarray(img_r),
            jnp.asarray(img_l), jnp.asarray(img_m),
            window=5, k=5, num_classes=nc))
        want = self._reference(pr, uv, img_r, img_l, img_m, 5, 5, nc)
        # Ties in distance can resolve differently; demand near-total
        # agreement rather than bitwise equality.
        agree = (got == want).mean()
        assert agree > 0.97, agree

    def test_duplicate_pixels_deep_segments(self, rng):
        # Many points in the same pixel exercises the segment fill.
        h, w, nc = 8, 32, 6
        img_r = rng.uniform(1, 10, (h, w)).astype(np.float32)
        img_l = rng.integers(0, nc, (h, w)).astype(np.int32)
        img_m = np.ones((h, w), bool)
        n = 128
        uv = np.zeros((n, 2), np.int32)
        uv[:, 0] = 3
        uv[:, 1] = 7          # everyone in one pixel
        pr = (img_r[3, 7] + rng.normal(0, 0.2, n)).astype(np.float32)
        got = np.asarray(ops.knn_refine(
            jnp.asarray(pr), jnp.asarray(uv), jnp.asarray(img_r),
            jnp.asarray(img_l), jnp.asarray(img_m),
            window=3, k=3, num_classes=nc))
        want = self._reference(pr, uv, img_r, img_l, img_m, 3, 3, nc)
        # fill_depth=32 covers the first 32; the rest fall back to the
        # projected label, which the reference also produces when the
        # cutoff excludes everything — only compare the filled prefix
        # ordering-independently via agreement rate.
        agree = (got == want).mean()
        assert agree > 0.2, agree
        assert (got[:16] == want[:16]).mean() > 0.9

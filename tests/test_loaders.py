"""L1 loader tests on the REAL on-disk formats (SURVEY.md §4 "Data"):
fixture writers materialize KITTI / SemanticKITTI / ModelNet layouts,
then the dataset classes read them back.
"""

import dataclasses

import numpy as np
import pytest

from lisec_tpu.config import load_config
from lisec_tpu.data import fixtures
from lisec_tpu.data.kitti import Calibration, KittiDetection
from lisec_tpu.data.modelnet40 import ModelNet40
from lisec_tpu.data.semantickitti import SemanticKitti, read_label, remap_labels


def _cfg(base, root):
    cfg = load_config(base)
    return dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, fixture=False,
                                      root=str(root)))


class TestKittiDisk:
    def test_roundtrip(self, tmp_path):
        fixtures.write_kitti_fixture(str(tmp_path), num_frames=2, seed=3)
        cfg = _cfg("configs/pointpillars_tiny.yaml", tmp_path)
        ds = KittiDetection(cfg, "train")
        assert len(ds) == 2
        s = ds[0]
        assert s["points"].shape[1] == 4
        assert len(s["points"]) > 1000
        assert s["gt_boxes"].shape[1] == 7
        assert len(s["gt_boxes"]) == len(s["gt_classes"])
        # The written scene's boxes should cover points (sanity: each
        # box contains >= 5 points after the camera->lidar round trip).
        from lisec_tpu.data.augment import _points_in_box_np
        for box in s["gt_boxes"]:
            assert _points_in_box_np(s["points"], box).sum() >= 5

    def test_calibration_roundtrip(self, tmp_path):
        fixtures.write_kitti_fixture(str(tmp_path), num_frames=1)
        calib = Calibration(str(tmp_path / "training/calib/000000.txt"))
        pts = np.array([[10.0, 2.0, -1.0], [30.0, -5.0, 0.5]])
        rect = calib.lidar_to_rect(pts)
        back = calib.rect_to_lidar(rect)
        np.testing.assert_allclose(back, pts, atol=1e-6)


class TestSemanticKittiDisk:
    def test_roundtrip(self, tmp_path):
        fixtures.write_semantickitti_fixture(str(tmp_path), num_scans=2)
        cfg = _cfg("configs/rangeseg_tiny.yaml", tmp_path)
        ds = SemanticKitti(cfg, "train")
        assert len(ds) == 2
        s = ds[0]
        assert s["points"].shape[1] == 4
        assert len(s["point_labels"]) == len(s["points"])
        # Upper 16 bits (instance id) must be stripped.
        assert s["point_labels"].max() < 2 ** 16

    def test_remap(self):
        raw = np.array([0, 10, 252, 31, 99], np.int32)
        out = remap_labels(raw)
        np.testing.assert_array_equal(out, [0, 1, 1, 7, 0])


class TestModelNetDisk:
    def test_roundtrip(self, tmp_path):
        fixtures.write_modelnet_fixture(str(tmp_path), num_per_class=2,
                                        num_classes=3)
        cfg = load_config("configs/pointnet_modelnet40_tiny.yaml")
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(
                cfg.data, fixture=False, root=str(tmp_path),
                num_points=128, num_classes=3))
        ds = ModelNet40(cfg, "train")
        assert len(ds) == 6
        s = ds[0]
        assert s["points"].shape == (128, 3)
        assert 0 <= s["label"] < 3
        # Unit-sphere normalized.
        assert np.linalg.norm(s["points"], axis=1).max() <= 1.0 + 1e-5


class TestSeekableBatches:
    def test_start_batch_equals_skipping(self):
        """make_batches(start_batch=k) == consuming k batches first —
        the O(1) resume contract (shuffle from (seed, epoch), augment
        RNG from (seed, epoch, batch))."""
        import numpy as np
        from lisec_tpu.config import BudgetConfig
        from lisec_tpu.data.collate import make_batches

        class DS:
            def __len__(self):
                return 10

            def __getitem__(self, i):
                r = np.random.default_rng(i)
                return {"points": r.normal(size=(32, 4)).astype(np.float32),
                        "label": i % 4}

        ds, budget = DS(), BudgetConfig(max_points=32)

        def jitter(sample, rng):
            s = dict(sample)
            s["points"] = sample["points"] + rng.normal(
                0, 0.01, sample["points"].shape).astype(np.float32)
            return s

        k = 7
        full = make_batches(ds, budget, 4, shuffle=True, seed=3,
                            augment_fn=jitter)
        for _ in range(k):
            next(full)
        seek = make_batches(ds, budget, 4, shuffle=True, seed=3,
                            augment_fn=jitter, start_batch=k)
        for _ in range(3):
            a, b = next(full), next(seek)
            assert a.keys() == b.keys()
            for key in a:
                np.testing.assert_array_equal(a[key], b[key])


class TestHardFixture:
    """Ray-cast hard detection fixture (VERDICT r4 #9): occlusion,
    truncation, ring density falloff, distractors, per-gt difficulty."""

    def test_difficulty_buckets_separate(self):
        d = np.concatenate([
            fixtures.make_detection_scene_hard(s)["difficulty"]
            for s in range(8)])
        # All three buckets (and the ignore bin) must be populated —
        # the whole point of the hard fixture is discriminative AP.
        for level in (0, 1, 2, -1):
            assert np.sum(d == level) > 0, f"no gts at difficulty {level}"

    def test_occlusion_costs_points(self):
        # Points are lidar returns: an object behind another gets fewer
        # rays, and ignored (-1) gts have < 5 visible points by
        # construction; easy gts must be densely hit.
        from lisec_tpu.ops import boxes as box_ops
        import jax.numpy as jnp
        sc = fixtures.make_detection_scene_hard(1)
        inside = np.asarray(box_ops.points_in_rbbox(
            jnp.asarray(sc["points"][:, :3]),
            jnp.asarray(sc["gt_boxes"])))
        counts = inside.sum(axis=0)
        easy = sc["difficulty"] == 0
        if easy.any():
            assert counts[easy].min() >= 20
        # Ray-cast scenes never fill the interior: every box's points
        # must be a small fraction of the uniform fixture's ~200.
        assert counts.max() < 4000

    def test_ring_density_falloff(self):
        sc = fixtures.make_detection_scene_hard(0)
        r = np.hypot(sc["points"][:, 0], sc["points"][:, 1])
        near = np.sum((r > 5) & (r < 15)) / 10.0
        far = np.sum((r > 40) & (r < 60)) / 20.0
        assert near > 5 * far    # points-per-meter falls with range

    def test_dataset_plumbs_difficulty(self):
        cfg = load_config("configs/pointpillars_tiny.yaml")
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(
                cfg.data, fixture=True, fixture_hard=True,
                fixture_size=4))
        train = KittiDetection(cfg, "train")[0]
        assert (train["difficulty"] >= 0).all()     # -1 gts dropped
        val = KittiDetection(cfg, "val")[1]
        assert "difficulty" in val
        assert len(val["difficulty"]) == len(val["gt_boxes"])

    def test_deterministic(self):
        a = fixtures.make_detection_scene_hard(7)
        b = fixtures.make_detection_scene_hard(7)
        assert np.array_equal(a["points"], b["points"])
        assert np.array_equal(a["gt_boxes"], b["gt_boxes"])

"""int16 wire format (data/wire.py): quantization error bounds,
non-prefix-mask compaction, and infer_packed vs infer agreement on the
tiny detection config (the e2e bench path)."""

import numpy as np
import pytest

import lisec_tpu
from lisec_tpu.config import load_config
from lisec_tpu.data.wire import pack_points_q16, unpack_points_q16


def _roundtrip(points, mask):
    packed = pack_points_q16(points, mask)
    out = unpack_points_q16({k: np.asarray(v) if k != "points_q16" else v
                             for k, v in packed.items()})
    return np.asarray(out["points"]), np.asarray(out["point_mask"]), packed


class TestWireFormat:
    def test_roundtrip_error_below_sensor_noise(self, rng):
        # KITTI-like spans: x in [0, 70], y in [-40, 40], z in [-3, 1].
        pts = np.stack([
            rng.uniform(0, 70, (4, 1000)),
            rng.uniform(-40, 40, (4, 1000)),
            rng.uniform(-3, 1, (4, 1000)),
            rng.uniform(0, 1, (4, 1000)),
        ], axis=-1).astype(np.float32)
        mask = np.ones((4, 1000), bool)
        deq, m2, _ = _roundtrip(pts, mask)
        assert (m2 == mask).all()
        err = np.abs(deq - pts).max(axis=(0, 1))
        # worst-case step/2: span/65535/2 -> x ~0.6mm, y ~0.7mm
        assert err[0] < 1.5e-3 and err[1] < 1.5e-3
        assert err[2] < 1e-4 and err[3] < 5e-5

    def test_non_prefix_mask_compacted(self, rng):
        pts = rng.normal(size=(2, 16, 4)).astype(np.float32)
        mask = np.zeros((2, 16), bool)
        mask[0, [1, 3, 7]] = True          # holes
        mask[1, :5] = True                 # prefix
        deq, m2, packed = _roundtrip(pts, mask)
        assert packed["num_points"].tolist() == [3, 5]
        # compacted valid points keep their relative order
        np.testing.assert_allclose(
            deq[0, :3], pts[0, [1, 3, 7]], atol=2e-4)
        np.testing.assert_allclose(deq[1, :5], pts[1, :5], atol=2e-4)
        assert m2[0].sum() == 3 and m2[1].sum() == 5

    def test_empty_batch(self):
        pts = np.zeros((2, 8, 4), np.float32)
        mask = np.zeros((2, 8), bool)
        deq, m2, packed = _roundtrip(pts, mask)
        assert packed["num_points"].tolist() == [0, 0]
        assert not m2.any()
        assert np.isfinite(deq).all()


class TestInferPacked:
    def test_matches_f32_infer(self):
        cfg = load_config("configs/pointpillars_tiny.yaml")
        pipeline = lisec_tpu.build_model(cfg)
        state = pipeline.init_state(0)
        from lisec_tpu.data.collate import make_batches
        ds = pipeline.make_dataset("val")
        batch = next(make_batches(ds, cfg.budget, 2, shuffle=False,
                                  epochs=1))
        ref = {k: np.asarray(v) for k, v in pipeline.infer(
            state, {"points": batch["points"],
                    "point_mask": batch["point_mask"]}).items()}
        packed = pack_points_q16(batch["points"], batch["point_mask"])
        out = {k: np.asarray(v) for k, v in
               pipeline.infer_packed(state, packed).items()}
        # mm-level input perturbation: same detections, near-identical
        # boxes. Compare the valid sets.
        assert (ref["valid"] == out["valid"]).mean() > 0.95
        both = ref["valid"] & out["valid"]
        if both.any():
            np.testing.assert_allclose(
                ref["boxes"][both], out["boxes"][both],
                rtol=0.05, atol=0.05)

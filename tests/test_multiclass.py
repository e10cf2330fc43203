"""Multi-class detection: 3-class anchors/assignment/NMS and MSG
part-seg variant both build, train a step, and infer with full AP eval.
"""

import numpy as np
import pytest

import jax

import lisec_tpu
from lisec_tpu.config import apply_overrides, load_config


def test_three_class_pointpillars():
    cfg = load_config("configs/pointpillars_tiny.yaml")
    cfg = apply_overrides(cfg, [
        "data.class_names=[Car,Pedestrian,Cyclist]",
        "model.params.eval_ap=true",
        "data.fixture_size=8",
    ])
    pipeline = lisec_tpu.build_model(cfg)
    # Anchors: fmap cells x 3 classes x 2 rotations.
    ny, nx = pipeline.fmap
    assert pipeline.anchors.shape == (ny * nx * 6, 7)
    assert int(pipeline.anchor_classes.max()) == 2

    state = pipeline.init_state(0)
    from lisec_tpu.data.collate import make_batches
    batch = next(make_batches(pipeline.make_dataset("train"), cfg.budget,
                              cfg.train.batch_size, shuffle=False))
    state, aux = pipeline.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))

    metrics = pipeline.evaluate(state, max_batches=1)
    # Full AP eval produced per-class buckets.
    assert "class0_3d_ap_moderate" in metrics
    assert "class2_3d_ap_moderate" in metrics


def test_msg_partseg_builds_and_steps():
    cfg = load_config("configs/pointnet2_partseg_tiny.yaml")
    cfg = apply_overrides(cfg, ["model.params.msg=true"])
    pipeline = lisec_tpu.build_model(cfg)
    state = pipeline.init_state(0)
    from lisec_tpu.data.collate import make_batches
    batch = next(make_batches(pipeline.make_dataset("train"), cfg.budget,
                              cfg.train.batch_size, shuffle=False))
    state, aux = pipeline.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))

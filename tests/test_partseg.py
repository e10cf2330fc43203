"""Stage-2 integration: PointNet++ part segmentation on fixtures —
one train step runs, loss decreases over a short run, eval produces
mIoU (SURVEY.md §7 stage 2).
"""

import numpy as np
import pytest

import jax

import lisec_tpu
from lisec_tpu.config import apply_overrides, load_config


@pytest.fixture(scope="module")
def cfg():
    return load_config("configs/pointnet2_partseg_tiny.yaml")


def test_train_step_and_shapes(cfg):
    pipeline = lisec_tpu.build_model(cfg)
    state = pipeline.init_state(0)
    from lisec_tpu.data.collate import make_batches
    ds = pipeline.make_dataset("train")
    batch = next(make_batches(ds, cfg.budget, cfg.train.batch_size,
                              shuffle=False))
    state, aux = pipeline.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))

    out = pipeline.infer(state, batch)
    assert out["labels"].shape == (cfg.train.batch_size,
                                   cfg.budget.max_points)


def test_short_training_learns(cfg):
    cfg = apply_overrides(cfg, ["train.num_steps=80",
                                "data.fixture_size=16"])
    pipeline, state, history = lisec_tpu.train(cfg, progress=False)
    losses = [h["loss"] for h in history if "loss" in h]
    assert losses[-1] < losses[0]
    accs = [h["acc"] for h in history if "acc" in h]
    assert accs[-1] > 0.4   # 12 parts, chance ~0.08

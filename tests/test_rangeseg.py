"""Stage-6 integration: range-image segmentation — project -> net ->
kNN refine trains and infers per-point labels (SURVEY.md §7 stage 6).
"""

import numpy as np
import pytest

import jax

import lisec_tpu
from lisec_tpu.config import apply_overrides, load_config


@pytest.fixture(scope="module")
def cfg():
    return load_config("configs/rangeseg_tiny.yaml")


def test_train_step_and_infer(cfg):
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
    assert (np.asarray(out["labels"]) >= 0).all()
    assert (np.asarray(out["labels"]) < cfg.data.num_classes).all()


def test_short_training_learns(cfg):
    cfg = apply_overrides(cfg, ["train.num_steps=60"])
    pipeline, state, history = lisec_tpu.train(cfg, progress=False)
    losses = [h["loss"] for h in history if "loss" in h]
    assert losses[-1] < losses[0]
    accs = [h["acc"] for h in history if "acc" in h]
    assert accs[-1] > 0.3   # 8 classes, learnable geometry bands

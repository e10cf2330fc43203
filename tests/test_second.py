"""Stage-5 integration: SECOND sparse-conv detector — voxelize ->
mean-VFE -> sparse middle encoder -> BEV head runs, trains, and infers
(SURVEY.md §7 stage 5).
"""

import numpy as np
import pytest

import jax

import lisec_tpu
from lisec_tpu.config import load_config


@pytest.fixture(scope="module")
def cfg():
    return load_config("configs/second_tiny.yaml")


def test_train_step_and_infer(cfg):
    pipeline = lisec_tpu.build_model(cfg)
    state = pipeline.init_state(0)
    from lisec_tpu.data.collate import make_batches
    ds = pipeline.make_dataset("train")
    batch = next(make_batches(ds, cfg.budget, cfg.train.batch_size,
                              shuffle=False))
    state, aux = pipeline.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["num_pos"]) > 0

    out = pipeline.infer(state, batch)
    b = cfg.train.batch_size
    assert out["boxes"].shape == (b, cfg.budget.nms_post, 7)
    assert np.isfinite(np.asarray(out["boxes"])).all()

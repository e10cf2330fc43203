"""Golden-file regression tests (SURVEY.md §4 oracle #3): freeze the
detector and segmenter outputs for fixed fixture clouds with fixed-seed
parameters, and diff future runs against them.

Regenerate (after an INTENTIONAL behavior change) with:

    GOLDEN_REGEN=1 python -m pytest tests/test_goldens.py -q

Goldens are created on the CPU backend with highest matmul precision
(the conftest forces both), so they are deterministic across runs.
"""

import os

import numpy as np
import pytest

import jax

import lisec_tpu
from lisec_tpu.config import load_config

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
REGEN = os.environ.get("GOLDEN_REGEN") == "1"


def _infer_outputs(config_path):
    cfg = load_config(config_path)
    pipeline = lisec_tpu.build_model(cfg)
    state = pipeline.init_state(0)
    from lisec_tpu.data.collate import make_batches
    ds = pipeline.make_dataset("train")
    batch = next(make_batches(ds, cfg.budget, cfg.train.batch_size,
                              shuffle=False))
    return jax.device_get(pipeline.infer(state, batch))


def _check_or_regen(name, outputs, keys, atol=1e-4):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    if REGEN or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez(path, **{k: np.asarray(outputs[k]) for k in keys})
        if not REGEN:
            pytest.skip(f"golden {name} created; rerun to compare")
        return
    golden = np.load(path)
    for k in keys:
        np.testing.assert_allclose(
            np.asarray(outputs[k]), golden[k], atol=atol, rtol=1e-4,
            err_msg=f"{name}:{k} drifted from golden "
                    f"(GOLDEN_REGEN=1 to accept)")


def test_pointpillars_golden():
    out = _infer_outputs("configs/pointpillars_tiny.yaml")
    _check_or_regen("pointpillars_tiny", out,
                    ["boxes", "scores", "labels"])


def test_rangeseg_golden():
    out = _infer_outputs("configs/rangeseg_tiny.yaml")
    _check_or_regen("rangeseg_tiny", out, ["labels"])


def test_second_golden():
    out = _infer_outputs("configs/second_tiny.yaml")
    _check_or_regen("second_tiny", out, ["boxes", "scores", "labels"])


def test_partseg_golden():
    out = _infer_outputs("configs/pointnet2_partseg_tiny.yaml")
    _check_or_regen("pointnet2_partseg_tiny", out, ["labels"])


def test_pointnet_cls_golden():
    out = _infer_outputs("configs/pointnet_modelnet40_tiny.yaml")
    _check_or_regen("pointnet_cls_tiny", out, ["labels", "logits"])

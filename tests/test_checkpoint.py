"""R6 integration: exact checkpoint/resume — train 10 steps equals
train 5, restore, train 5 (SURVEY.md §5.4).
"""

import os

import numpy as np
import pytest

import jax

import lisec_tpu
from lisec_tpu.config import apply_overrides, load_config


def test_exact_resume(tmp_path):
    base = load_config("configs/pointnet_modelnet40_tiny.yaml")
    ck1 = str(tmp_path / "run_full")
    ck2 = str(tmp_path / "run_half")

    cfg10 = apply_overrides(base, [
        "train.num_steps=10", f"train.ckpt_dir={ck1}",
        "train.ckpt_every=5", "train.log_every=100"])
    _, state_full, _ = lisec_tpu.train(cfg10, progress=False)

    cfg5 = apply_overrides(base, [
        "train.num_steps=5", f"train.ckpt_dir={ck2}",
        "train.ckpt_every=5", "train.log_every=100"])
    _, state_half, _ = lisec_tpu.train(cfg5, progress=False)

    cfg_resume = apply_overrides(base, [
        "train.num_steps=10", f"train.ckpt_dir={ck2}",
        "train.ckpt_every=5", "train.resume=auto",
        "train.log_every=100"])
    _, state_resumed, _ = lisec_tpu.train(cfg_resume, progress=False)

    assert int(state_resumed.step) == 10
    # Same seed + same data order => identical params to the unbroken
    # 10-step run (data order is seeded per step index, not stateful).
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        state_full.params, state_resumed.params)


def test_weights_npz_roundtrip(tmp_path):
    """save_weights_npz -> load_weights_npz restores params and
    batch_stats exactly into a freshly-initialized state (the trained
    snapshot path bench.py uses for the deployment-regime measurement).
    """
    from lisec_tpu.api import build_model
    from lisec_tpu.bench_lib import load_weights_npz, save_weights_npz

    cfg = load_config("configs/pointnet_modelnet40_tiny.yaml")
    pipeline = build_model(cfg)
    trained = pipeline.init_state(seed=7)    # stand-in "trained" state
    path = str(tmp_path / "w.npz")
    save_weights_npz(trained, path)

    fresh = pipeline.init_state(seed=0)
    restored = load_weights_npz(fresh, path)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        trained.params, restored.params)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)),
        trained.batch_stats, restored.batch_stats)

"""Freeze a trained model's outputs on a fixed held-out batch.

Loads the latest checkpoint from the config's ckpt_dir, runs the
pipeline's inference on the first val-split batch (fixed seed, no
shuffle), and writes an npz next to the convergence evidence
(docs/convergence/<name>_trained_outputs.npz). Used at the end of each
convergence rehearsal so the trained behavior — not just the loss
curve — is a committed, diffable artifact.

Run: python benchmarks/save_trained_outputs.py <config.yaml> <name>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")

import numpy as np


def main():
    cfg_path, name = sys.argv[1], sys.argv[2]
    from lisec_tpu.api import build_model
    from lisec_tpu.config import load_config
    from lisec_tpu.data.collate import make_batches
    from lisec_tpu.training.checkpoint import CheckpointManager

    cfg = load_config(cfg_path)
    pipeline = build_model(cfg)
    state = pipeline.init_state(cfg.train.seed)
    ckpt = CheckpointManager(cfg.train.ckpt_dir)
    restored = ckpt.restore(state)
    assert restored is not None, f"no checkpoint in {cfg.train.ckpt_dir}"
    state = restored
    ckpt.close()
    print(f"restored step {int(state.step)}")

    ds = pipeline.make_dataset("val")
    batch = next(make_batches(ds, cfg.budget, cfg.train.batch_size,
                              shuffle=False))
    out = pipeline.infer(state, batch)
    arrs = {k: np.asarray(v) for k, v in out.items()}
    path = os.path.join("docs", "convergence", f"{name}_trained_outputs.npz")
    np.savez_compressed(path, step=int(state.step), **arrs)
    for k, v in arrs.items():
        print(f"  {k}: {v.shape} {v.dtype}")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

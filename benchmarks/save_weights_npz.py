"""Snapshot a trained checkpoint's params + batch_stats to a flat npz.

Orbax checkpoint dirs carry the full optimizer state (3x params for
AdamW, ~61 MB for SECOND) and are directory trees — awkward to commit.
This writes just the inference weights as one compressed npz keyed by
tree paths (lisec_tpu.bench_lib.save_weights_npz), so bench.py can
measure the DEPLOYED regime: a trained head's sparse scores let NMS
early-exit, while an untrained head's ~0.5 sigmoid scores force the
worst case on every cloud (12.6 of 63.1 ms at b32 — profile_nms.py).

Run: python benchmarks/save_weights_npz.py <config.yaml> <out.npz>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")


def main():
    cfg_path, out_path = sys.argv[1], sys.argv[2]
    from lisec_tpu.api import build_model
    from lisec_tpu.bench_lib import save_weights_npz
    from lisec_tpu.config import load_config
    from lisec_tpu.training.checkpoint import CheckpointManager

    cfg = load_config(cfg_path)
    pipeline = build_model(cfg)
    state = pipeline.init_state(cfg.train.seed)
    ckpt = CheckpointManager(cfg.train.ckpt_dir)
    restored = ckpt.restore(state)
    assert restored is not None, f"no checkpoint in {cfg.train.ckpt_dir}"
    ckpt.close()
    save_weights_npz(restored, out_path)
    size = os.path.getsize(out_path)
    print(f"wrote {out_path} ({size / 1e6:.1f} MB, step {int(restored.step)})")


if __name__ == "__main__":
    main()

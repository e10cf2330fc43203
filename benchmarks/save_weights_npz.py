"""Snapshot a trained checkpoint's params + batch_stats to a flat npz.

Orbax checkpoint dirs carry the full optimizer state (3x params for
AdamW, ~61 MB for SECOND) and are directory trees — awkward to commit.
This writes just the inference weights as one compressed npz keyed by
tree paths (the same keys `lisec_tpu.bench_lib.load_weights_npz`
expects), so bench.py can measure the DEPLOYED regime: a trained
head's sparse scores let NMS early-exit, while an untrained head's
~0.5 sigmoid scores force the worst case on every cloud (12.6 of
63.1 ms at b32 — profile_nms.py).

HOST-ONLY on purpose: the checkpoint is plain files, so this restores
template-free via orbax on the CPU backend and never touches the axon
device (whose ~15 MB/s tunnel turns the init-state template pull into
many minutes, and whose host pulls have deadlocked — ROUND5_NOTES).

Run: python benchmarks/save_weights_npz.py <config.yaml> <out.npz>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import orbax.checkpoint as ocp


def _tree_key(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                    for p in path)


def main():
    cfg_path, out_path = sys.argv[1], sys.argv[2]
    from lisec_tpu.config import load_config

    cfg = load_config(cfg_path)
    mngr = ocp.CheckpointManager(os.path.abspath(cfg.train.ckpt_dir))
    step = mngr.latest_step()
    assert step is not None, f"no checkpoint in {cfg.train.ckpt_dir}"
    raw = mngr.restore(step, args=ocp.args.StandardRestore())
    mngr.close()

    out = {}
    for prefix in ("params", "batch_stats"):
        tree = raw[prefix]
        for kp, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
            out[f"{prefix}/{_tree_key(kp)}"] = np.asarray(leaf)
    np.savez_compressed(out_path, **out)
    size = os.path.getsize(out_path)
    print(f"wrote {out_path} ({size / 1e6:.1f} MB, step {step}, "
          f"{len(out)} leaves)")


if __name__ == "__main__":
    main()

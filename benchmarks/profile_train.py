"""Train-step profile for PointPillars (VERDICT r1 item 4).

Splits the jitted train step into: full step, target assigner alone
(the 107k-anchor x 64-gt rotated-IoU matrix), loss forward only, and
forward+backward. Chain-timed like profile_flagship.py.

Run: python benchmarks/profile_train.py [--batch 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")

import jax
import jax.numpy as jnp
import numpy as np

from benchmarks.profile_flagship import chain_timer, measure_sync_floor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from lisec_tpu.config import apply_overrides, load_config
    from lisec_tpu.api import build_model
    from lisec_tpu.bench_lib import _fixture_batch
    from lisec_tpu.training.assigner import assign_targets

    cfg = load_config("configs/pointpillars_kitti.yaml")
    cfg = apply_overrides(cfg, [
        "data.fixture=true", "data.fixture_size=8",
        "data.augment.enabled=false", "train.ckpt_dir=",
        f"train.batch_size={args.batch}",
    ])
    pipeline = build_model(cfg)
    state = pipeline.init_state(0)
    batch = _fixture_batch(cfg, args.batch)
    jb = jax.tree.map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(0)

    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms")
    B = args.batch
    it = args.iters

    def rec(name, fn, fargs):
        dt = chain_timer(fn, fargs, it, floor)
        print(f"{name:>18}: {1e3 * dt:8.3f} ms/batch-{B}"
              f"  ({B / dt:8.1f} clouds/s)")
        return dt

    # full train step (fwd+assign+bwd+optimizer), non-donating copy
    import optax

    def plain_step(points, pmask, gtb, gtc, gtm):
        bb = {"points": points, "point_mask": pmask, "gt_boxes": gtb,
              "gt_classes": gtc, "gt_mask": gtm}

        def loss_fn(params):
            return pipeline.loss(params, state.batch_stats, bb, rng,
                                 train=True)
        (loss, _), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, _ = pipeline.optimizer.update(
            grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return loss + optax.global_norm(params)
    rec("train_step", plain_step,
        (jb["points"], jb["point_mask"], jb["gt_boxes"],
         jb["gt_classes"], jb["gt_mask"]))

    # assigner alone
    def assign_fn(gtb, gtc, gtm):
        out = jax.vmap(lambda b, c, m: assign_targets(
            pipeline.anchors, pipeline.anchor_classes, pipeline.pos_thr,
            pipeline.neg_thr, b, c, m,
            row_chunk=pipeline.assign_row_chunk))(gtb, gtc, gtm)
        return (jnp.sum(out.reg_targets) + jnp.sum(out.cls_targets)
                + jnp.sum(out.positive))
    rec("assigner", assign_fn,
        (jb["gt_boxes"], jb["gt_classes"], jb["gt_mask"]))

    # loss forward only (includes assigner)
    def fwd_fn(points, pmask, gtb, gtc, gtm):
        bb = {"points": points, "point_mask": pmask, "gt_boxes": gtb,
              "gt_classes": gtc, "gt_mask": gtm}
        loss, _ = pipeline.loss(state.params, state.batch_stats, bb,
                                rng, train=True)
        return loss
    rec("loss_fwd", fwd_fn,
        (jb["points"], jb["point_mask"], jb["gt_boxes"],
         jb["gt_classes"], jb["gt_mask"]))


if __name__ == "__main__":
    main()

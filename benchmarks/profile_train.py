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

    # assigner alone — the SAME variant pipeline.loss uses (windowed
    # when assign_window is set; the round-3a profiler mistakenly
    # timed the dense assign_targets here and printed 570 ms while the
    # in-step windowed one costs ~26).
    from lisec_tpu.training.assigner import assign_targets_windowed_batched

    def assign_fn(gtb, gtc, gtm):
        if pipeline.assign_window:
            out = assign_targets_windowed_batched(
                pipeline.anchors, pipeline.anchor_classes,
                pipeline.pos_thr, pipeline.neg_thr,
                pipeline.class_sizes, pipeline.class_z, gtb, gtc, gtm,
                feature_map_size=pipeline.fmap,
                pc_range=tuple(cfg.voxel.point_cloud_range),
                window=pipeline.assign_window, cols=True)
        else:
            out = jax.vmap(lambda b, c, m: assign_targets(
                pipeline.anchors, pipeline.anchor_classes,
                pipeline.pos_thr, pipeline.neg_thr, b, c, m,
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

    # training-path pillar encoder alone (paint/unpaint/segment-max),
    # forward and forward+backward
    from lisec_tpu.models.pillar_encoder import FusedPillarEncoder
    cfgv = cfg.voxel
    enc = FusedPillarEncoder(
        num_filters=64, pc_range=tuple(cfgv.point_cloud_range),
        voxel_size=tuple(cfgv.voxel_size[:2]),
        grid=(cfgv.grid_size[0], cfgv.grid_size[1]),
        dtype=jnp.bfloat16)
    ev = enc.init(jax.random.PRNGKey(0), jb["points"], jb["point_mask"])

    def enc_fwd(p, m):
        out, _ = enc.apply(ev, p, m, train=True,
                           mutable=["batch_stats"])
        return jnp.sum(out.astype(jnp.float32))
    rec("enc_train_fwd", enc_fwd, (jb["points"], jb["point_mask"]))

    def enc_fb(p, m):
        def f(params):
            out, _ = enc.apply(
                {"params": params, "batch_stats": ev["batch_stats"]},
                p, m, train=True, mutable=["batch_stats"])
            return jnp.sum(out.astype(jnp.float32))
        g = jax.grad(f)(ev["params"])
        return sum(jnp.sum(x) for x in jax.tree.leaves(g))
    rec("enc_train_fwd_bwd", enc_fb, (jb["points"], jb["point_mask"]))

    # whole-network TRAIN forward (encoder train path + backbone +
    # head; no assigner, no losses): loss_fwd minus this minus the
    # assigner is the loss/target-build glue.
    def net_fwd(p, m):
        out, _ = pipeline.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            p, m, train=True, mutable=["batch_stats"])
        return sum(jnp.sum(o.astype(jnp.float32))
                   for o in jax.tree.leaves(out))
    rec("net_fwd_train", net_fwd, (jb["points"], jb["point_mask"]))

    # assigner + whole-network train forward in ONE chained fn: the
    # loss arithmetic itself (focal/smooth-L1/CE over (B, A)) is a few
    # MB of elementwise traffic, so if loss_fwd >> this stage the gap
    # is real glue; if loss_fwd ~= this stage the earlier "~9 ms loss
    # math" read was separately-timed stages losing fusion.
    def assign_net_fn(p, m, gtb, gtc, gtm):
        out, _ = pipeline.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            p, m, train=True, mutable=["batch_stats"])
        s = sum(jnp.sum(o.astype(jnp.float32))
                for o in jax.tree.leaves(out))
        return s + assign_fn(gtb, gtc, gtm)
    rec("assign_plus_net", assign_net_fn,
        (jb["points"], jb["point_mask"], jb["gt_boxes"],
         jb["gt_classes"], jb["gt_mask"]))

    # the two Pallas stages of the train encoder, isolated
    from lisec_tpu.ops.pallas.pillar_paint import segment_paint
    from lisec_tpu.ops.pallas.unpaint import segment_unpaint
    ncells = cfgv.grid_size[0] * cfgv.grid_size[1]
    bsz, n = jb["points"].shape[:2]
    cells = jnp.sort(
        jax.random.randint(rng, (bsz, n), 0, ncells, jnp.int32), axis=1)
    svals = jnp.zeros((bsz, n, 128), jnp.float32).at[..., 127].set(1.0)

    def paint_fn(v, c):
        return jnp.sum(segment_paint(
            v, c, num_cells=ncells, num_max=0, count_channel=127,
            slab=2048, window=512))
    rec("paint_128l", paint_fn, (svals, cells))

    tbl = segment_paint(svals, cells, num_cells=ncells, num_max=0,
                        count_channel=127, slab=2048, window=512)

    def unpaint_fn(t, c):
        return jnp.sum(segment_unpaint(t, c, num_rows=ncells))
    rec("unpaint_128l", unpaint_fn, (tbl, cells))


if __name__ == "__main__":
    main()

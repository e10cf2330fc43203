"""Per-stage profile of the range-seg inference program (r3 verdict
#7: 114.7 ms/batch-8 for a 64x2048 encoder-decoder, never attributed).

Stages, chain-timed back-to-back in one session: full predict, O12
range projection, encoder-decoder convs alone, argmax, O13 kNN refine.
Also prints the conv tower's bf16 FLOP count so the dominant stage can
be judged against the chip's roofline.

Run: python benchmarks/profile_rangeseg.py [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_bench")

import jax
import jax.numpy as jnp

from lisec_tpu.bench_lib import chain_time, measure_sync_floor


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--gap", action="store_true",
                    help="composed-stage brackets for the full-vs-sum "
                         "gap")
    ap.add_argument("--knn", action="store_true",
                    help="also attribute O13's sub-stages")
    args = ap.parse_args()

    from lisec_tpu.config import apply_overrides, load_config
    from lisec_tpu.api import build_model
    from lisec_tpu.data.collate import make_batches
    from lisec_tpu.ops.knn_refine import knn_refine_batch

    cfg = load_config("configs/rangeseg_semantickitti.yaml")
    cfg = apply_overrides(cfg, [
        "data.fixture=true", "data.fixture_size=8",
        "train.ckpt_dir=", f"train.batch_size={args.batch}",
    ])
    pipeline = build_model(cfg)
    state = pipeline.init_state(0)
    ds = pipeline.make_dataset("train")
    batch_np = next(make_batches(ds, cfg.budget, args.batch,
                                 shuffle=False))
    pts = jnp.asarray(batch_np["points"])
    mask = jnp.asarray(batch_np["point_mask"])
    B = args.batch
    floor = measure_sync_floor()
    print(f"sync floor: {1e3 * floor:.1f} ms")
    results = {}

    def rec(name, fn, fargs):
        dt = chain_time(fn, fargs, args.iters, floor)
        results[name] = round(1e3 * dt, 3)
        print(f"{name:>18}: {1e3 * dt:8.3f} ms/batch-{B}")

    def full(p, m):
        out = pipeline.predict(state.params, state.batch_stats,
                               {"points": p, "point_mask": m})
        return jnp.sum(out["labels"].astype(jnp.float32))
    rec("full_predict", full, (pts, mask))

    def proj_only(p, m):
        pr = pipeline._project(p, m)
        return jnp.sum(pr.image.astype(jnp.float32))
    rec("range_project", proj_only, (pts, mask))

    proj = pipeline._project(pts, mask)
    img = proj.image

    def net_only(im):
        logits = pipeline.model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            im, train=False)
        return jnp.sum(logits.astype(jnp.float32))
    rec("conv_tower", net_only, (img,))

    logits = pipeline.model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        img, train=False)
    plabels = jnp.argmax(logits, -1).astype(jnp.int32)

    def refine_only(pr_range, im0):
        return jnp.sum(knn_refine_batch(
            pr_range, proj.pixel_pix, im0, plabels, proj.image_mask,
            window=pipeline.knn_window, k=pipeline.knn_k,
            num_classes=pipeline.num_classes).astype(jnp.float32))
    rec("knn_refine", refine_only, (proj.point_range, img[..., 0]))

    if args.gap:
        # Composed-stage brackets for the full-vs-sum gap (~28-35 ms
        # both sessions it was seen): the isolated stages above get
        # PRE-STAGED contiguous inputs, while the composed program
        # feeds knn_refine strided slices of the projection outputs
        # and pays every intermediate's materialization. Bracket it:
        # everything-but-conv vs conv+argmax; their sum against full
        # localizes which boundary owns the gap.
        def proj_knn(p, m):
            pr = pipeline._project(p, m)
            pl = jnp.zeros_like(pr.image_mask, dtype=jnp.int32)
            return jnp.sum(knn_refine_batch(
                pr.point_range, pr.pixel_pix, pr.image[..., 0], pl,
                pr.image_mask, window=pipeline.knn_window,
                k=pipeline.knn_k,
                num_classes=pipeline.num_classes).astype(jnp.float32))
        rec("proj_plus_knn", proj_knn, (pts, mask))

        def conv_argmax(im):
            logits = pipeline.model.apply(
                {"params": state.params,
                 "batch_stats": state.batch_stats}, im, train=False)
            return jnp.sum(jnp.argmax(logits, -1).astype(jnp.float32))
        rec("conv_argmax", conv_argmax, (img,))

        def knn_strided(p, m):
            # knn_refine on the REAL (strided) projection outputs but
            # with the projection itself hoisted out via pre-staging:
            # isolates the strided-slice cost from the proj cost.
            return jnp.sum(knn_refine_batch(
                proj.point_range, proj.pixel_pix, p[..., 0], plabels,
                m, window=pipeline.knn_window, k=pipeline.knn_k,
                num_classes=pipeline.num_classes).astype(jnp.float32))
        rec("knn_on_strided_img", knn_strided, (img, proj.image_mask))

    if args.knn:
        # O13 sub-stage attribution (separately-timed stages lose
        # fusion — sum > whole is expected; the RATIOS are the signal).
        from lisec_tpu.ops.knn_refine import (
            _build_table_cols, _deliver_rows, _forward_fill, _vote)

        window, k = pipeline.knn_window, pipeline.knn_k
        half, s2 = window // 2, window * window
        h, w = img.shape[1:3]
        hw, n = h * w, proj.point_range.shape[1]
        im0 = img[..., 0]

        def tbl(im0):
            return jnp.sum(_build_table_cols(
                im0, plabels, proj.image_mask, half, s2))
        rec("knn_table", tbl, (im0,))

        pix = proj.pixel_pix
        idx = jnp.broadcast_to(
            jnp.arange(n, dtype=jnp.int32)[None], pix.shape)
        pix_s, _, range_s = jax.lax.sort(
            (pix, idx, proj.point_range), dimension=1, num_keys=2)
        table = _build_table_cols(im0, plabels, proj.image_mask, half, s2)

        def deliver(t):
            return jnp.sum(_deliver_rows(t, pix_s, hw, n, False))
        rec("knn_deliver", deliver, (table,))

        first_rows = _deliver_rows(table, pix_s, hw, n, False)

        def fill(fr):
            return jnp.sum(_forward_fill(fr, pix_s, 32))
        rec("knn_fill", fill, (first_rows,))

        filled = _forward_fill(first_rows, pix_s, 32)

        def vote(fl, rs):
            r, hv = _vote(fl, rs, s2, k, pipeline.num_classes, 1.0)
            return jnp.sum(r) + jnp.sum(hv)
        rec("knn_vote", vote, (filled, range_s))

    # Conv-tower roofline: count MACs from the widths config.
    h, w = pipeline.height, pipeline.width
    widths = tuple(cfg.model.params.get("widths", [32, 64, 128, 256]))
    flops = 0
    cin, hh, ww = 5, h, w
    # stem conv + per-stage (res block = 2 convs + down)
    flops += 2 * 9 * cin * widths[0] * hh * ww
    cin = widths[0]
    for i, wd in enumerate(widths):
        if i:
            hh, ww = hh // (1 if i > 2 else 2) or hh, ww // 2
        flops += 2 * (2 * 9 * wd * wd + 9 * cin * wd) * hh * ww
        cin = wd
    flops *= 2  # decoder approx mirrors encoder
    print(f"approx conv GFLOP/cloud (bf16): {flops / 1e9:.1f} "
          f"-> {flops * B / 1e12:.2f} TFLOP/batch; at 58% MFU of 197T "
          f"-> {1e3 * flops * B / (0.58 * 197e12):.1f} ms/batch")
    print(json.dumps(results))


if __name__ == "__main__":
    main()

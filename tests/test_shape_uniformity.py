"""Kernel-shape uniformity guard (VERDICT r2 weak #8).

There is no persistent Mosaic cache on the axon backend and every
distinct Pallas kernel shape costs ~1.5 min of remote compile, so the
models keep every paint/unpaint/spread call site on a SHARED static
shape (see sparse_conv3d_spread's pad_to). Nothing enforced that
invariant — a config change could silently multiply compiles. This
test traces each model's forward+backward with jax.eval_shape (no
compilation) and counts distinct kernel-shape keys.
"""

import jax
import numpy as np
import pytest

import lisec_tpu
from lisec_tpu.config import load_config
from lisec_tpu.ops.pallas import pillar_paint, spread_kernel, unpaint


@pytest.fixture()
def record_kernels(monkeypatch):
    paints, unpaints = [], []
    orig_paint = pillar_paint.segment_paint
    orig_unpaint = unpaint.segment_unpaint
    orig_spread = spread_kernel.spread_accumulate

    def _key(shape, kw):
        return (shape, tuple(sorted(
            (k, v) for k, v in kw.items() if k != "interpret")))

    def rec_paint(vals, cell, **kw):
        paints.append(("paint",) + _key(vals.shape, kw))
        return orig_paint(vals, cell, **kw)

    def rec_spread(vals, tgt, **kw):
        paints.append(("spread",) + _key(vals.shape, kw))
        return orig_spread(vals, tgt, **kw)

    def rec_unpaint(table, cell, **kw):
        unpaints.append(_key(table.shape, kw))
        return orig_unpaint(table, cell, **kw)

    monkeypatch.setattr(pillar_paint, "segment_paint", rec_paint)
    monkeypatch.setattr(spread_kernel, "spread_accumulate", rec_spread)
    monkeypatch.setattr(unpaint, "segment_unpaint", rec_unpaint)
    return paints, unpaints


def _trace_train(cfg_path, record_kernels):
    paints, unpaints = record_kernels
    cfg = load_config(cfg_path)
    pipeline = lisec_tpu.build_model(cfg)
    state = pipeline.init_state(0)
    batch = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
             for k, v in pipeline.dummy_batch().items()}
    paints.clear()
    unpaints.clear()

    def grad_fn(params):
        return jax.grad(
            lambda p: pipeline.loss(
                p, state.batch_stats, batch_arrs, jax.random.PRNGKey(0),
                True)[0])(params)

    batch_arrs = {k: np.zeros(v.shape, v.dtype) for k, v in batch.items()}
    jax.eval_shape(grad_fn, state.params)
    return (set(paints), set(unpaints), pipeline, state, batch_arrs,
            paints, unpaints)


def test_second_shares_one_spread_shape(record_kernels):
    paint_keys, unpaint_keys, *_ = _trace_train(
        "configs/second_tiny.yaml", record_kernels)
    # Expected set (round 4, dense_from_level=2 + sort+paint assigner):
    #   paints : voxelizer record paint + the assigner's per-anchor
    #            sort+paint reduction                       (2)
    #   fwd spreads: ONE K-merged shape shared by the level-0..d-1
    #            convs (pad_to/pad_c) + ONE for the strided conv into
    #            the dense tail (its own budget/width)       (2)
    #   bwd spreads: dz (B*K batch) + in_of (8 ch) for EACH of the two
    #            fwd shapes                                  (4)
    #   unpaint: the densify paint's exact-VJP unpaint       (1)
    # Growth beyond this means a new per-conv compile was introduced
    # (~1.5 min of remote Mosaic compile per distinct shape).
    assert len(paint_keys) <= 8, sorted(paint_keys)
    assert len(unpaint_keys) <= 1, sorted(unpaint_keys)


def test_pointpillars_train_and_predict_shapes(record_kernels):
    (paint_keys, unpaint_keys, pipeline, state, batch,
     paints, unpaints) = _trace_train(
        "configs/pointpillars_tiny.yaml", record_kernels)
    # Train path: stats paint (sum) + segment-max paint + the
    # assigner's per-anchor sort+paint reduction (round 4); stats
    # unpaint + VJP unpaint.
    assert len(paint_keys) <= 3, sorted(paint_keys)
    assert len(unpaint_keys) <= 2, sorted(unpaint_keys)

    from lisec_tpu.ops.pallas import encoder_kernel
    encs = []
    orig = encoder_kernel.pillar_canvas_fused

    def rec(points, mask, w, t, **kw):
        encs.append((points.shape, tuple(sorted(
            (k, v) for k, v in kw.items() if k != "interpret"))))
        return orig(points, mask, w, t, **kw)

    encoder_kernel.pillar_canvas_fused = rec
    try:
        paints.clear()
        unpaints.clear()
        jax.eval_shape(
            lambda p: pipeline.predict(p, state.batch_stats, batch),
            state.params)
    finally:
        encoder_kernel.pillar_canvas_fused = orig
    # Inference: exactly one fused encoder kernel shape, no paints.
    assert len(set(encs)) == 1, encs
    assert len(set(paints)) == 0, set(paints)

"""Property-based fuzzing of O10/O11 invariants (SURVEY.md §4:
"pytest + hypothesis"). Each property is a law that must hold for ANY
input, complementing the seeded-random + hand-edge tests in
test_ops.py:

  O10 rotated IoU: symmetry, range [0, 1], exact-overlap identity,
      translation invariance, and yaw +pi wrap invariance.
  O11 rotated NMS: idempotence (running NMS on its own output changes
      nothing), mutual-IoU bound among survivors, descending scores,
      and score-threshold respect.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

import jax.numpy as jnp

from lisec_tpu.ops.nms import rotated_nms
from lisec_tpu.ops.rotated_iou import rotated_iou_bev

_settings = settings(max_examples=25, deadline=None)


def _boxes_strategy(n):
    # 7-DoF boxes with sane KITTI-ish extents; yaw spans several wraps.
    finite = st.floats(-40.0, 40.0, width=32)
    size = st.floats(0.5, 8.0, width=32)
    yaw = st.floats(-7.0, 7.0, width=32)
    box = st.tuples(finite, finite, st.floats(-3.0, 1.0, width=32),
                    size, size, size, yaw)
    return st.lists(box, min_size=n, max_size=n).map(
        lambda bs: np.asarray(bs, np.float32))


@_settings
@given(_boxes_strategy(8))
def test_iou_symmetry_and_range(boxes):
    a = jnp.asarray(boxes)
    m = np.asarray(rotated_iou_bev(a[:, None, :], a[None, :, :]))
    assert np.all(m >= -1e-6) and np.all(m <= 1.0 + 1e-5)
    np.testing.assert_allclose(m, m.T, atol=2e-4)
    # Self-IoU is exactly-overlapping geometry -> 1.
    np.testing.assert_allclose(np.diag(m), 1.0, atol=1e-4)


@_settings
@given(_boxes_strategy(6),
       st.floats(-30.0, 30.0, width=32), st.floats(-30.0, 30.0, width=32))
def test_iou_translation_invariance(boxes, dx, dy):
    a = jnp.asarray(boxes)
    b = a.at[:, 0].add(dx).at[:, 1].add(dy)
    ma = np.asarray(rotated_iou_bev(a[:, None, :], a[None, :, :]))
    mb = np.asarray(rotated_iou_bev(b[:, None, :], b[None, :, :]))
    np.testing.assert_allclose(ma, mb, atol=5e-4)


@_settings
@given(_boxes_strategy(6))
def test_iou_yaw_pi_wrap(boxes):
    # A rectangle rotated by pi is the same rectangle.
    a = jnp.asarray(boxes)
    b = a.at[:, 6].add(np.pi)
    ma = np.asarray(rotated_iou_bev(a[:, None, :], a[None, :, :]))
    mb = np.asarray(rotated_iou_bev(a[:, None, :], b[None, :, :]))
    np.testing.assert_allclose(ma, mb, atol=5e-4)


def _run_nms(boxes, scores, labels, thr=0.5, score_thr=0.05):
    return rotated_nms(
        jnp.asarray(boxes), jnp.asarray(scores),
        jnp.asarray(labels, dtype=jnp.int32),
        iou_threshold=thr, score_threshold=score_thr,
        nms_pre=boxes.shape[0], nms_post=boxes.shape[0])


@_settings
@given(_boxes_strategy(12), st.integers(0, 2 ** 31 - 1))
def test_nms_invariants_and_idempotence(boxes, seed):
    rng = np.random.default_rng(seed)
    scores = rng.uniform(0.0, 1.0, len(boxes)).astype(np.float32)
    labels = rng.integers(0, 2, len(boxes))
    out = _run_nms(boxes, scores, labels)
    v = np.asarray(out.valid)
    kb = np.asarray(out.boxes)[v]
    ks = np.asarray(out.scores)[v]
    kl = np.asarray(out.labels)[v]

    # Scores descend and respect the threshold.
    assert np.all(ks > 0.05 - 1e-6)
    assert np.all(np.diff(ks) <= 1e-6)
    # No same-class survivor pair overlaps above the NMS threshold.
    if len(kb) > 1:
        m = np.asarray(rotated_iou_bev(
            jnp.asarray(kb)[:, None, :], jnp.asarray(kb)[None, :, :]))
        same = kl[:, None] == kl[None, :]
        off = ~np.eye(len(kb), dtype=bool)
        assert np.all(m[same & off] <= 0.5 + 1e-4)

    # Idempotence: NMS of the kept set keeps everything.
    if len(kb):
        out2 = _run_nms(kb, ks, kl)
        v2 = np.asarray(out2.valid)
        assert v2.sum() == len(kb)
        np.testing.assert_allclose(np.asarray(out2.boxes)[v2], kb,
                                   atol=1e-6)

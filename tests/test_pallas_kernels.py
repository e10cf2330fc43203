"""Pallas kernels vs their XLA twins (interpret mode on CPU;
SURVEY.md §5.2: interpret==compiled equivalence is the race check for
hand-written kernels).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from lisec_tpu.ops.fps import farthest_point_sampling
from lisec_tpu.ops.pallas.fps_kernel import fps_pallas
from tests.oracles import ops_np


def _cloud(rng, n):
    return rng.uniform(-5, 5, (n, 3)).astype(np.float32)


@pytest.mark.parametrize("n,m", [(256, 32), (512, 128)])
def test_fps_pallas_matches_xla(rng, n, m):
    pts = _cloud(rng, n)
    mask = np.ones(n, bool)
    got = np.asarray(fps_pallas(jnp.asarray(pts), jnp.asarray(mask), m,
                                interpret=True))
    want = np.asarray(farthest_point_sampling(
        jnp.asarray(pts), jnp.asarray(mask), m))
    np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(got, ops_np.fps_np(pts, mask, m))


def test_fps_pallas_masked(rng):
    pts = _cloud(rng, 256)
    mask = np.zeros(256, bool)
    mask[64:128] = True
    got = np.asarray(fps_pallas(jnp.asarray(pts), jnp.asarray(mask), 32,
                                interpret=True))
    assert got.min() >= 64 and got.max() < 128
    np.testing.assert_array_equal(got, ops_np.fps_np(pts, mask, 32))


def test_fps_pallas_batched(rng):
    pts = np.stack([_cloud(rng, 128) for _ in range(3)])
    mask = np.ones((3, 128), bool)
    got = np.asarray(fps_pallas(jnp.asarray(pts), jnp.asarray(mask), 16,
                                interpret=True))
    for b in range(3):
        np.testing.assert_array_equal(
            got[b], ops_np.fps_np(pts[b], mask[b], 16))

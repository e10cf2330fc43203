"""Pallas kernels vs their XLA twins (interpret mode on CPU;
SURVEY.md §5.2: interpret==compiled equivalence is the race check for
hand-written kernels).
"""

import numpy as np
import pytest

import jax
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


class TestGatherMXU:
    def test_gather_matches_take_along_axis(self, rng):
        from lisec_tpu.ops.pallas.gather_mxu import gather_rows_mxu
        b, n, c, m = 2, 256, 64, 300
        src = rng.normal(size=(b, n, c)).astype(np.float32)
        idx = rng.integers(-1, n, (b, m)).astype(np.int32)
        got = np.asarray(gather_rows_mxu(
            jnp.asarray(src), jnp.asarray(idx), tile_m=128,
            interpret=True))
        want = np.where((idx >= 0)[..., None],
                        np.take_along_axis(
                            src, np.maximum(idx, 0)[..., None], axis=1),
                        0.0)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_gather_bf16_exact(self, rng):
        from lisec_tpu.ops.pallas.gather_mxu import gather_rows_mxu
        b, n, c, m = 1, 128, 8, 64
        src = rng.normal(size=(b, n, c)).astype(jnp.bfloat16)
        idx = rng.integers(0, n, (b, m)).astype(np.int32)
        got = np.asarray(gather_rows_mxu(
            jnp.asarray(src), jnp.asarray(idx), tile_m=64,
            interpret=True).astype(jnp.float32))
        want = np.take_along_axis(
            np.asarray(src.astype(jnp.float32)), idx[..., None], axis=1)
        np.testing.assert_array_equal(got, want)

    def test_scatter_accumulates_duplicates(self, rng):
        from lisec_tpu.ops.pallas.gather_mxu import scatter_rows_mxu
        b, m, c, n = 1, 200, 16, 64
        vals = rng.normal(size=(b, m, c)).astype(np.float32)
        idx = rng.integers(0, n, (b, m)).astype(np.int32)
        got = np.asarray(scatter_rows_mxu(
            jnp.asarray(vals), jnp.asarray(idx), num_rows=n,
            tile_m=64, interpret=True))
        want = np.zeros((b, n, c), np.float32)
        for i in range(m):
            want[0, idx[0, i]] += vals[0, i]
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_gather_grad_is_scatter(self, rng):
        from lisec_tpu.ops.pallas.gather_mxu import gather_rows
        b, n, c, m = 1, 96, 8, 120
        src = jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n, (b, m)).astype(np.int32))
        w = jnp.asarray(rng.normal(size=(b, m, c)).astype(np.float32))

        g_mxu = jax.grad(
            lambda s: jnp.sum(gather_rows(s, idx, True) * w))(src)
        g_xla = jax.grad(lambda s: jnp.sum(
            jnp.take_along_axis(s, idx[..., None], axis=1) * w))(src)
        np.testing.assert_allclose(np.asarray(g_mxu), np.asarray(g_xla),
                                   rtol=2e-4, atol=2e-4)

"""§5.7 point-dimension sharding: sharded FPS / ball query equal the
single-device ops on the 8-virtual-device CPU mesh (SURVEY.md §5.7)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from lisec_tpu.ops.ball_query import ball_query
from lisec_tpu.ops.fps import farthest_point_sampling
from lisec_tpu.parallel.point_sharded import (ball_query_sharded,
                                              fps_sharded)


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the 8-virtual-device CPU mesh")
    return Mesh(np.asarray(devs[:8]), ("points",))


def test_fps_sharded_equals_single(mesh, rng):
    n, m = 1024, 64
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    mask = rng.random(n) > 0.1
    want = np.asarray(farthest_point_sampling(
        jnp.asarray(pts), jnp.asarray(mask), m, use_pallas=False))
    got = np.asarray(fps_sharded(
        jnp.asarray(pts), jnp.asarray(mask), m, mesh))
    np.testing.assert_array_equal(got, want)


def test_fps_sharded_all_masked_shard(mesh, rng):
    # One shard fully masked out: its points never get selected.
    n, m = 512, 32
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    mask = np.ones(n, bool)
    mask[:n // 8] = False            # shard 0 entirely invalid
    want = np.asarray(farthest_point_sampling(
        jnp.asarray(pts), jnp.asarray(mask), m, use_pallas=False))
    got = np.asarray(fps_sharded(
        jnp.asarray(pts), jnp.asarray(mask), m, mesh))
    np.testing.assert_array_equal(got, want)
    assert np.all(got >= n // 8)


def test_ball_query_sharded_equals_single(mesh, rng):
    n, m, k = 1024, 32, 16
    pts = rng.uniform(0, 4, (n, 3)).astype(np.float32)
    ctr = rng.uniform(0, 4, (m, 3)).astype(np.float32)
    mask = rng.random(n) > 0.1
    want = np.asarray(ball_query(
        jnp.asarray(ctr), jnp.asarray(pts), jnp.asarray(mask),
        radius=0.8, num_neighbors=k))
    got = np.asarray(ball_query_sharded(
        jnp.asarray(ctr), jnp.asarray(pts), jnp.asarray(mask),
        radius=0.8, num_neighbors=k, mesh=mesh))
    np.testing.assert_array_equal(got, want)

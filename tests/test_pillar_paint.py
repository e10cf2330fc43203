"""Pallas slab-paint kernel (O1/O6 inference path) vs numpy oracle,
and fast-encoder == reference-encoder equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lisec_tpu.ops.pallas.pillar_paint import segment_paint


def _oracle(vals, cell, nc, num_max):
    b, n, c = vals.shape
    out = np.concatenate(
        [np.full((b, nc, num_max), -3.0e38, np.float32),
         np.zeros((b, nc, c - num_max), np.float32)], -1)
    for bi in range(b):
        for i in range(n):
            ci = cell[bi, i]
            if ci < nc:
                out[bi, ci, :num_max] = np.maximum(
                    out[bi, ci, :num_max], vals[bi, i, :num_max])
                out[bi, ci, num_max:] += vals[bi, i, num_max:]
    return out


def _run(vals, cell, nc, **kw):
    return np.asarray(segment_paint(
        jnp.asarray(vals), jnp.asarray(cell), num_cells=nc,
        num_max=64, count_channel=67, interpret=True, **kw))


def _vals(rng, b, n):
    v = rng.normal(size=(b, n, 128)).astype(np.float32)
    v[..., 67] = 1.0
    return v


class TestSegmentPaint:
    def test_random_vs_oracle(self, rng):
        b, n, nc = 2, 512, 1000
        cell = np.sort(rng.integers(0, nc + 1, (b, n)).astype(np.int32), -1)
        vals = _vals(rng, b, n)
        got = _run(vals, cell, nc, slab=256, window=128)
        np.testing.assert_allclose(
            got, _oracle(vals, cell, nc, 64), atol=1e-4)

    def test_all_points_one_cell(self, rng):
        b, n, nc = 1, 256, 600
        cell = np.full((b, n), 300, np.int32)
        vals = _vals(rng, b, n)
        got = _run(vals, cell, nc, slab=256, window=128)
        np.testing.assert_allclose(
            got, _oracle(vals, cell, nc, 64), atol=1e-4)

    def test_all_invalid(self, rng):
        b, n, nc = 1, 256, 512
        cell = np.full((b, n), nc, np.int32)      # sentinel everywhere
        vals = _vals(rng, b, n)
        got = _run(vals, cell, nc, slab=256, window=128)
        assert (got[..., :64] == -3.0e38).all()
        assert (got[..., 64:] == 0).all()

    def test_cells_span_windows_and_slabs(self, rng):
        # long runs of equal cells crossing window AND slab boundaries
        b, n, nc = 1, 512, 700
        runs = np.repeat(np.arange(0, 700, 37), 30)[:n]
        cell = np.sort(runs.astype(np.int32))[None]
        vals = _vals(rng, b, n)
        got = _run(vals, cell, nc, slab=128, window=128)
        np.testing.assert_allclose(
            got, _oracle(vals, cell, nc, 64), atol=1e-4)


class TestFastEncoderParity:
    def test_fast_matches_reference(self, rng):
        from lisec_tpu.models.pillar_encoder import FusedPillarEncoder

        enc = FusedPillarEncoder(
            num_filters=64, grid=(64, 64),
            pc_range=(0.0, -20.48, -3.0, 10.24, 20.48, 1.0),
            voxel_size=(0.16, 0.64), dtype=jnp.float32)
        pts = rng.uniform([-1, -25, -4, 0], [12, 25, 2, 1],
                          (2, 2048, 4)).astype(np.float32)
        mask = rng.random((2, 2048)) > 0.1
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                     jnp.asarray(mask))
        v = jax.tree.map(lambda x: x, v)
        v = {"params": dict(v["params"]),
             "batch_stats": dict(v["batch_stats"])}
        # non-trivial BN stats so the inference fold is exercised
        v["batch_stats"]["mean"] = jnp.asarray(
            rng.normal(size=64) * 0.1, jnp.float32)
        v["batch_stats"]["var"] = jnp.asarray(
            1.0 + rng.random(64), jnp.float32)
        v["params"]["bias"] = jnp.asarray(
            rng.normal(size=64) * 0.1, jnp.float32)

        fast = enc.apply(v, jnp.asarray(pts), jnp.asarray(mask),
                         train=False)
        slow_enc = FusedPillarEncoder(
            num_filters=64, grid=(64, 64),
            pc_range=(0.0, -20.48, -3.0, 10.24, 20.48, 1.0),
            voxel_size=(0.16, 0.64), dtype=jnp.float32,
            fast_inference=False)
        slow = slow_enc.apply(v, jnp.asarray(pts), jnp.asarray(mask),
                              train=False)
        np.testing.assert_allclose(
            np.asarray(fast), np.asarray(slow), atol=2e-3)

    def test_fast_bf16_matches_reference(self, rng):
        # Production configuration: bf16 canvas -> single-matmul u
        # routing (split_u=False). Tolerance is set by the bf16 canvas
        # quantization plus the BIG-shifted bf16 routing lane.
        from lisec_tpu.models.pillar_encoder import FusedPillarEncoder

        kw = dict(num_filters=64, grid=(64, 64),
                  pc_range=(0.0, -20.48, -3.0, 10.24, 20.48, 1.0),
                  voxel_size=(0.16, 0.64))
        enc = FusedPillarEncoder(dtype=jnp.bfloat16, **kw)
        pts = rng.uniform([-1, -25, -4, 0], [12, 25, 2, 1],
                          (2, 2048, 4)).astype(np.float32)
        mask = rng.random((2, 2048)) > 0.1
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                     jnp.asarray(mask))
        fast = enc.apply(v, jnp.asarray(pts), jnp.asarray(mask),
                         train=False)
        slow = FusedPillarEncoder(
            dtype=jnp.float32, fast_inference=False, **kw).apply(
                v, jnp.asarray(pts), jnp.asarray(mask), train=False)
        fast = np.asarray(fast, np.float32)
        slow = np.asarray(slow, np.float32)
        tol = 0.03 * max(1.0, float(np.abs(slow).max()))
        assert np.abs(fast - slow).max() < tol

    def test_train_step_updates_batch_stats(self, rng):
        from lisec_tpu.models.pillar_encoder import FusedPillarEncoder

        enc = FusedPillarEncoder(
            num_filters=16, grid=(32, 32),
            pc_range=(0.0, -10.24, -3.0, 5.12, 10.24, 1.0),
            voxel_size=(0.16, 0.64), dtype=jnp.float32)
        pts = rng.uniform([-1, -12, -4, 0], [6, 12, 2, 1],
                          (2, 512, 4)).astype(np.float32)
        mask = np.ones((2, 512), bool)
        v = enc.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                     jnp.asarray(mask))
        out, mut = enc.apply(v, jnp.asarray(pts), jnp.asarray(mask),
                             train=True, mutable=["batch_stats"])
        assert not np.allclose(np.asarray(mut["batch_stats"]["mean"]),
                               np.asarray(v["batch_stats"]["mean"]))
        # gradients flow through the reference path
        def loss(params):
            o = enc.apply({"params": params,
                           "batch_stats": v["batch_stats"]},
                          jnp.asarray(pts), jnp.asarray(mask),
                          train=True, mutable=["batch_stats"])[0]
            return jnp.sum(o ** 2)
        g = jax.grad(loss)(v["params"])
        assert float(jnp.abs(g["kernel"]).sum()) > 0


class TestSegmentUnpaint:
    def _oracle(self, table, cell):
        b, n = cell.shape
        out = np.zeros((b, n, 128), np.float32)
        for bi in range(b):
            for i in range(n):
                if cell[bi, i] < table.shape[1]:
                    out[bi, i] = table[bi, cell[bi, i]]
        return out

    def test_random_vs_oracle(self, rng):
        from lisec_tpu.ops.pallas.unpaint import segment_unpaint
        b, n, r = 2, 512, 1000
        cell = np.sort(rng.integers(0, r + 300, (b, n)).astype(np.int32), -1)
        table = rng.normal(size=(b, r, 128)).astype(np.float32)
        got = np.asarray(segment_unpaint(
            jnp.asarray(table), jnp.asarray(cell), num_rows=r,
            slab=256, window=128, interpret=True))
        want = self._oracle(table, cell)
        valid = cell < r
        # Default routing is a bf16 hi+mid split: ~2^-17 relative.
        np.testing.assert_allclose(got[valid], want[valid],
                                   rtol=2e-5, atol=2e-5)
        exact = np.asarray(segment_unpaint(
            jnp.asarray(table), jnp.asarray(cell), num_rows=r,
            slab=256, window=128, interpret=True, exact=True))
        np.testing.assert_array_equal(exact[valid], want[valid])

    def test_unaligned_slab_boundaries(self, rng):
        # Long equal-cell runs so slab ranges start/end mid-window and
        # the sequential-overwrite design is exercised.
        from lisec_tpu.ops.pallas.unpaint import segment_unpaint
        b, n, r = 1, 512, 700
        runs = np.repeat(np.arange(0, 700, 37), 30)[:n]
        cell = np.sort(runs.astype(np.int32))[None]
        table = rng.normal(size=(b, r, 128)).astype(np.float32)
        got = np.asarray(segment_unpaint(
            jnp.asarray(table), jnp.asarray(cell), num_rows=r,
            slab=128, window=128, interpret=True, exact=True))
        np.testing.assert_array_equal(got, self._oracle(table, cell))


class TestSegmentMaxSorted:
    def test_value_and_grad_vs_xla(self, rng):
        from lisec_tpu.ops.scatter import segment_max_sorted
        b, n, c, nc = 2, 512, 64, 600
        cell = np.sort(rng.integers(0, nc + 1, (b, n)).astype(np.int32), -1)
        h = rng.normal(size=(b, n, c)).astype(np.float32)

        def pallas_sum(hh):
            canvas, count = segment_max_sorted(
                hh, jnp.asarray(cell), nc, True)
            canvas = jnp.where(count[..., None] > 0, canvas, 0.0)
            return jnp.sum(canvas * jnp.arange(c)), canvas

        def xla_sum(hh):
            neg = jnp.full((nc + 1, c), -3.0e38)
            idx = jnp.asarray(cell)

            def one(hb, ib):
                t = neg.at[ib].max(hb, mode="promise_in_bounds")[:nc]
                return jnp.where(t > -1.0e38, t, 0.0)
            canvas = jax.vmap(one)(hh, idx)
            return jnp.sum(canvas * jnp.arange(c)), canvas

        (lp, cp), gp = jax.value_and_grad(pallas_sum, has_aux=True)(
            jnp.asarray(h))
        (lx, cx), gx = jax.value_and_grad(xla_sum, has_aux=True)(
            jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(cp), np.asarray(cx),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   atol=1e-4)


class TestSegmentSumDense:
    def test_value_and_grad_vs_xla(self, rng):
        """The SECOND densify (paint fwd / unpaint-gather bwd) against
        the XLA row-scatter it replaced — unique sorted cells, value
        and gradient."""
        from lisec_tpu.ops.scatter import segment_sum_dense
        b, n, c, nc = 2, 256, 16, 600
        cells = np.stack([
            np.sort(rng.choice(nc, n, replace=False)) for _ in range(b)
        ]).astype(np.int32)
        cells[:, -40:] = nc          # invalid tail
        h = rng.normal(size=(b, n, c)).astype(np.float32)

        def pallas_sum(hh):
            tab, cnt = segment_sum_dense(hh, jnp.asarray(cells), nc, True)
            return jnp.sum(tab * jnp.arange(c)), (tab, cnt)

        def xla_sum(hh):
            idx = jnp.asarray(cells)

            def one(hb, ib):
                return jnp.zeros((nc + 1, c)).at[ib].add(
                    hb, mode="drop")[:nc]
            tab = jax.vmap(one)(hh, idx)
            return jnp.sum(tab * jnp.arange(c)), tab

        (lp, (tp, cntp)), gp = jax.value_and_grad(
            pallas_sum, has_aux=True)(jnp.asarray(h))
        (lx, tx), gx = jax.value_and_grad(
            xla_sum, has_aux=True)(jnp.asarray(h))
        np.testing.assert_allclose(np.asarray(tp), np.asarray(tx),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx),
                                   atol=1e-4)
        # count channel: 1 at every valid painted cell
        assert float(jnp.sum(cntp)) == float(b * (n - 40))


class TestTrainPallasPath:
    def test_train_matches_reference(self, rng):
        from lisec_tpu.models.pillar_encoder import FusedPillarEncoder

        kw = dict(num_filters=64, grid=(64, 64),
                  pc_range=(0.0, -20.48, -3.0, 10.24, 20.48, 1.0),
                  voxel_size=(0.16, 0.64), dtype=jnp.float32)
        fast = FusedPillarEncoder(**kw)
        slow = FusedPillarEncoder(fast_train=False, **kw)
        pts = rng.uniform([-1, -25, -4, 0], [12, 25, 2, 1],
                          (2, 1024, 4)).astype(np.float32)
        mask = rng.random((2, 1024)) > 0.1
        v = fast.init(jax.random.PRNGKey(0), jnp.asarray(pts),
                      jnp.asarray(mask))

        def loss(enc, params):
            out, mut = enc.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                jnp.asarray(pts), jnp.asarray(mask), train=True,
                mutable=["batch_stats"])
            return jnp.sum(out * out), (out, mut)

        (lf, (of, mf)), gf = jax.value_and_grad(
            lambda p: loss(fast, p), has_aux=True)(v["params"])
        (ls, (os_, ms)), gs = jax.value_and_grad(
            lambda p: loss(slow, p), has_aux=True)(v["params"])
        np.testing.assert_allclose(np.asarray(of), np.asarray(os_),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(mf["batch_stats"]["mean"]),
            np.asarray(ms["batch_stats"]["mean"]), rtol=1e-4, atol=1e-5)
        for k in gf:
            np.testing.assert_allclose(
                np.asarray(gf[k]), np.asarray(gs[k]),
                rtol=2e-3, atol=2e-3, err_msg=k)

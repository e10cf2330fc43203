"""Stage-5 integration: SECOND sparse-conv detector — voxelize ->
mean-VFE -> sparse middle encoder -> BEV head runs, trains, and infers
(SURVEY.md §7 stage 5).
"""

import numpy as np
import pytest

import jax

import lisec_tpu
from lisec_tpu.config import load_config


@pytest.fixture(scope="module")
def cfg():
    return load_config("configs/second_tiny.yaml")


def test_train_step_and_infer(cfg):
    pipeline = lisec_tpu.build_model(cfg)
    state = pipeline.init_state(0)
    from lisec_tpu.data.collate import make_batches
    ds = pipeline.make_dataset("train")
    batch = next(make_batches(ds, cfg.budget, cfg.train.batch_size,
                              shuffle=False))
    state, aux = pipeline.train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(aux["loss"]))
    assert float(aux["num_pos"]) > 0

    out = pipeline.infer(state, batch)
    b = cfg.train.batch_size
    assert out["boxes"].shape == (b, cfg.budget.nms_post, 7)
    assert np.isfinite(np.asarray(out["boxes"])).all()


class TestSparseMiddleEncoderOracle:
    """The assembled encoder vs a dense numpy replica: multi-level
    coords handoff, strided active-set budgets, BN/relu epilogues, and
    the flatten-z BEV layout (VERDICT r2 weak #6)."""

    GRID = (8, 16, 16)            # (nz, ny, nx)
    CHANNELS = (8, 16)
    BUDGETS = (64, 40)            # level-1 budget overflows on purpose

    def _model(self):
        from lisec_tpu.models.second import SparseMiddleEncoder
        import jax.numpy as jnp
        return SparseMiddleEncoder(
            grid=self.GRID, channels=self.CHANNELS,
            level_budgets=self.BUDGETS, subm_per_level=2,
            dtype=jnp.float32)

    def _inputs(self, rng):
        nz, ny, nx = self.GRID
        v = self.BUDGETS[0]
        n_active = 50
        lins = np.sort(rng.choice(nz * ny * nx, n_active, replace=False))
        coords = np.stack([lins // (ny * nx), (lins // nx) % ny,
                           lins % nx], -1).astype(np.int32)
        coords = np.concatenate(
            [coords, np.full((v - n_active, 3), -1, np.int32)])
        feats = np.zeros((v, 4), np.float32)
        feats[:n_active] = rng.normal(size=(n_active, 4))
        return (feats[None], coords[None],
                np.asarray([n_active], np.int32))

    @staticmethod
    def _dense_conv(dense, active_in, w, stride, grid_in, active_out):
        """y[o] = sum_k dense[o*stride - 1 + offset_k] @ w[k] over the
        active_out set (offsets in (z,y,x) meshgrid order, pad 1)."""
        nz, ny, nx = grid_in
        cout = w.shape[-1]
        out = {}
        k = 0
        taps = [(oz, oy, ox) for oz in range(3) for oy in range(3)
                for ox in range(3)]
        for o in active_out:
            acc = np.zeros(cout, np.float32)
            for k, (oz, oy, ox) in enumerate(taps):
                tz = o[0] * stride - 1 + oz
                ty = o[1] * stride - 1 + oy
                tx = o[2] * stride - 1 + ox
                if 0 <= tz < nz and 0 <= ty < ny and 0 <= tx < nx \
                        and (tz, ty, tx) in active_in:
                    acc += dense[(tz, ty, tx)] @ w[k]
            out[tuple(o)] = acc
        return out

    def _strided_outs(self, active, go):
        """Dilated (canonical) active output set of the k3/s2/p1 conv:
        every output any input reaches, sorted by cell id, budget-capped."""
        outs = set()
        for (z, y, x) in active:
            for oz in range(3):
                for oy in range(3):
                    for ox in range(3):
                        t = (z + 1 - oz, y + 1 - oy, x + 1 - ox)
                        if all(c % 2 == 0 for c in t):
                            o = tuple(c // 2 for c in t)
                            if all(0 <= o[d] < go[d] for d in range(3)):
                                outs.add(o)
        return sorted(outs, key=lambda c: (c[0] * go[1] + c[1]) * go[2]
                      + c[2])[:self.BUDGETS[1]]

    @staticmethod
    def _bn_relu(table, scale, bias, mean, var):
        inv = scale / np.sqrt(var + 1e-3)
        return {c: np.maximum((v - mean) * inv + bias, 0.0)
                for c, v in table.items()}

    def test_matches_dense_oracle(self, rng):
        import jax.numpy as jnp

        model = self._model()
        feats, coords, num = self._inputs(rng)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                               jnp.asarray(coords), jnp.asarray(num))
        # Non-trivial BN stats/params so the inference fold is real.
        variables = jax.tree.map(lambda x: x, variables)
        params = jax.device_get(variables["params"])
        bstats = jax.device_get(variables["batch_stats"])
        for i in range(len(params)):
            key = f"SparseConv3D_{i}"
            bstats[key]["BatchNorm_0"]["mean"] = rng.normal(
                size=bstats[key]["BatchNorm_0"]["mean"].shape).astype(
                    np.float32) * 0.1
            bstats[key]["BatchNorm_0"]["var"] = (
                1.0 + rng.random(
                    bstats[key]["BatchNorm_0"]["var"].shape)).astype(
                        np.float32)
            params[key]["BatchNorm_0"]["bias"] = rng.normal(
                size=params[key]["BatchNorm_0"]["bias"].shape).astype(
                    np.float32) * 0.1

        got = np.asarray(model.apply(
            {"params": params, "batch_stats": bstats},
            jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(num),
            train=False))[0]

        # ---- dense numpy replica ------------------------------------
        nz, ny, nx = self.GRID
        nact = int(num[0])
        active = [tuple(c) for c in coords[0, :nact]]
        table = {c: feats[0, i] for i, c in enumerate(active)}

        def conv_i(i, table, active_set, stride, grid_in, active_out):
            p = params[f"SparseConv3D_{i}"]
            b = bstats[f"SparseConv3D_{i}"]["BatchNorm_0"]
            w = np.asarray(p["kernel"], np.float32)
            y = self._dense_conv(table, set(active_set), w, stride,
                                 grid_in, active_out)
            return self._bn_relu(
                y, np.asarray(p["BatchNorm_0"]["scale"]),
                np.asarray(p["BatchNorm_0"]["bias"]),
                b["mean"], b["var"])

        # Level 0: two submanifold convs on the input active set.
        table = conv_i(0, table, active, 1, self.GRID, active)
        table = conv_i(1, table, active, 1, self.GRID, active)

        # Strided downsample: active outs = reachable cells, sorted by
        # cell id, capped at the level budget.
        go = tuple((g + 2 - 3) // 2 + 1 for g in self.GRID)
        outs = self._strided_outs(active, go)
        table = conv_i(2, table, active, 2, self.GRID, outs)

        # Level 1: two submanifold convs on the downsampled set.
        table = conv_i(3, table, outs, 1, go, outs)
        table = conv_i(4, table, outs, 1, go, outs)

        # Flatten z into channels on the dense BEV canvas.
        c_last = self.CHANNELS[-1]
        want = np.zeros((go[1], go[2], go[0] * c_last), np.float32)
        for (z, y, x), val in table.items():
            want[y, x, z * c_last:(z + 1) * c_last] = val

        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestDenseTailOracle(TestSparseMiddleEncoderOracle):
    """Dense-tail encoder (dense_from_level=1) vs the same dense numpy
    replica: level 0 and the strided downsample stay sparse (budget
    truncation applies at the boundary, exercised on purpose), then
    the level-1 submanifold convs run as dense masked convs — inactive
    cells stay exactly zero and BN statistics come from active cells
    only (inference mode: same affine as list BN)."""

    def _model(self):
        from lisec_tpu.models.second import SparseMiddleEncoder
        import jax.numpy as jnp
        return SparseMiddleEncoder(
            grid=self.GRID, channels=self.CHANNELS,
            level_budgets=self.BUDGETS, subm_per_level=2,
            dense_from_level=1, dtype=jnp.float32)

    def test_matches_dense_oracle(self, rng):
        import jax.numpy as jnp

        model = self._model()
        feats, coords, num = self._inputs(rng)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                               jnp.asarray(coords), jnp.asarray(num))
        params = jax.device_get(variables["params"])
        bstats = jax.device_get(variables["batch_stats"])
        # Non-trivial BN stats/params for every conv (sparse + dense).
        for key in params:
            bn = ("BatchNorm_0" if key.startswith("SparseConv3D")
                  else None)
            tgt_s = params[key][bn] if bn else params[key]
            tgt_b = bstats[key][bn] if bn else bstats.get(key)
            if "mean" not in (tgt_b or {}):
                continue
            tgt_b["mean"] = rng.normal(
                size=tgt_b["mean"].shape).astype(np.float32) * 0.1
            tgt_b["var"] = (1.0 + rng.random(
                tgt_b["var"].shape)).astype(np.float32)
            tgt_s["bias"] = rng.normal(
                size=tgt_s["bias"].shape).astype(np.float32) * 0.1

        got = np.asarray(model.apply(
            {"params": params, "batch_stats": bstats},
            jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(num),
            train=False))[0]

        nz, ny, nx = self.GRID
        nact = int(num[0])
        active = [tuple(c) for c in coords[0, :nact]]
        table = {c: feats[0, i] for i, c in enumerate(active)}

        def sparse_conv_i(i, table, active_set, stride, grid_in,
                          active_out):
            p = params[f"SparseConv3D_{i}"]
            b = bstats[f"SparseConv3D_{i}"]["BatchNorm_0"]
            w = np.asarray(p["kernel"], np.float32)
            y = self._dense_conv(table, set(active_set), w, stride,
                                 grid_in, active_out)
            return self._bn_relu(
                y, np.asarray(p["BatchNorm_0"]["scale"]),
                np.asarray(p["BatchNorm_0"]["bias"]),
                b["mean"], b["var"])

        def dense_conv_i(i, table, active_in, stride, grid_in,
                         active_out):
            p = params[f"Conv_{i}"]
            bnp = params[f"MaskedBatchNorm_{i}"]
            bnb = bstats[f"MaskedBatchNorm_{i}"]
            w = np.asarray(p["kernel"], np.float32).reshape(
                27, *p["kernel"].shape[-2:])       # (kz,ky,kx) row-major
            y = self._dense_conv(table, set(active_in), w, stride,
                                 grid_in, active_out)
            return self._bn_relu(
                y, np.asarray(bnp["scale"]), np.asarray(bnp["bias"]),
                bnb["mean"], bnb["var"])

        # Level 0 sparse: two submanifold convs + the sparse strided
        # downsample (budget truncation at the boundary, as in the
        # fully-sparse oracle).
        table = sparse_conv_i(0, table, active, 1, self.GRID, active)
        table = sparse_conv_i(1, table, active, 1, self.GRID, active)

        go = tuple((g + 2 - 3) // 2 + 1 for g in self.GRID)
        outs = self._strided_outs(active, go)
        table = sparse_conv_i(2, table, active, 2, self.GRID, outs)

        # Dense tail: the two level-1 submanifold convs as dense
        # masked convs.
        table = dense_conv_i(0, table, outs, 1, go, outs)
        table = dense_conv_i(1, table, outs, 1, go, outs)

        c_last = self.CHANNELS[-1]
        want = np.zeros((go[1], go[2], go[0] * c_last), np.float32)
        for (z, y, x), val in table.items():
            want[y, x, z * c_last:(z + 1) * c_last] = val

        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


class TestFootprintOracle(TestSparseMiddleEncoderOracle):
    """Sparsity-retaining downsample (downsample="footprint") vs the
    same dense numpy replica: the strided conv's output set is
    restricted to cells whose 2x2x2 input footprint is occupied
    (|out| <= |in| instead of 3-4x dilation), and values at the kept
    cells must still equal the dense conv's values there (the rulebook
    gathers all 27 taps regardless of how the output set was chosen)."""

    def _model(self):
        from lisec_tpu.models.second import SparseMiddleEncoder
        import jax.numpy as jnp
        return SparseMiddleEncoder(
            grid=self.GRID, channels=self.CHANNELS,
            level_budgets=self.BUDGETS, subm_per_level=2,
            downsample="footprint", dtype=jnp.float32)

    def _strided_outs(self, active, go):
        outs = {tuple(c // 2 for c in cell) for cell in active}
        outs = {o for o in outs
                if all(0 <= o[d] < go[d] for d in range(3))}
        return sorted(outs, key=lambda c: (c[0] * go[1] + c[1]) * go[2]
                      + c[2])[:self.BUDGETS[1]]


class TestFootprintDenseTailOracle(TestDenseTailOracle):
    """Footprint downsample composed with the dense masked tail: the
    boundary densify + masked convs must mask to the FOOTPRINT active
    set (2x2x2 max-pool propagation, not 3^3 dilation)."""

    def _model(self):
        from lisec_tpu.models.second import SparseMiddleEncoder
        import jax.numpy as jnp
        return SparseMiddleEncoder(
            grid=self.GRID, channels=self.CHANNELS,
            level_budgets=self.BUDGETS, subm_per_level=2,
            dense_from_level=1, downsample="footprint",
            dtype=jnp.float32)

    _strided_outs = TestFootprintOracle._strided_outs

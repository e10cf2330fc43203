"""Distributed (DP) tests on the 8-virtual-device CPU mesh
(SURVEY.md §4 "Distributed" row): the sharded train step produces
gradients/updates identical to the single-device step on the same
concatenated batch, and the multichip dryrun entry works.
"""

import dataclasses

import numpy as np
import pytest

import jax

import lisec_tpu
from lisec_tpu.config import apply_overrides, load_config


def _make(cfg, num_devices):
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train,
                                       num_devices=num_devices))
    return lisec_tpu.build_model(cfg)


@pytest.fixture(scope="module")
def cfg():
    cfg = load_config("configs/pointnet_modelnet40_tiny.yaml")
    return apply_overrides(cfg, ["train.batch_size=16"])


def test_dp_step_matches_single_device(cfg, eight_devices):
    from lisec_tpu.data.collate import make_batches

    pipe1 = _make(cfg, 1)
    pipe8 = _make(cfg, 8)
    state1 = pipe1.init_state(0)
    state8 = pipe8.init_state(0)
    # Same init on both meshes.
    chex_equal = jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6),
        state1.params, state8.params)
    del chex_equal

    ds = pipe1.make_dataset("train")
    batch = next(make_batches(ds, cfg.budget, 16, shuffle=False))
    rng = jax.random.PRNGKey(7)

    new1, aux1 = pipe1.train_step(state1, batch, rng)
    new8, aux8 = pipe8.train_step(state8, batch, rng)

    np.testing.assert_allclose(
        float(aux1["loss"]), float(aux8["loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(aux1["grad_norm"]), float(aux8["grad_norm"]), rtol=1e-3)
    # Params after one Adam step: the 8-way all-reduce sums grads in a
    # different order than the single-device reduction, and Adam's
    # sign-sensitive update FLIPS for exactly-zero grads whose float
    # rounding changes sign — a handful of elements can differ by a
    # full 2*lr. Require the mismatch fraction to be negligible and
    # bounded by the update scale instead of elementwise equality.
    lr = 0.002

    def close_enough(a, b):
        a, b = np.asarray(a), np.asarray(b)
        diff = np.abs(a - b)
        frac_off = np.mean(diff > 1e-3)
        assert frac_off < 1e-4, f"{frac_off:.2%} elements differ"
        assert diff.max() <= 2 * lr + 1e-4, diff.max()

    jax.tree.map(close_enough, new1.params, new8.params)


def test_dryrun_multichip(eight_devices):
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_compiles(eight_devices):
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn).lower(*args).compile()(*args)
    assert "boxes" in out


class TestMultiHostPieces:
    """P2/P3 units, exercised single-process (SURVEY.md §2.4): the
    per-host dataset shard and the process-local global-batch assembly
    (`make_array_from_process_local_data`) that multi-host runs use."""

    def test_process_shard_dataset_partitions(self):
        from lisec_tpu.parallel import ProcessShardDataset

        data = list(range(103))
        shards = [ProcessShardDataset(data, process_id=p, process_count=4)
                  for p in range(4)]
        # equal per-host length (ragged tail dropped)
        assert all(len(s) == 103 // 4 for s in shards)
        seen = sorted(x for s in shards for x in
                      (s[i] for i in range(len(s))))
        # disjoint, no duplicates
        assert len(seen) == len(set(seen)) == 4 * (103 // 4)

    def test_process_local_assembly_matches_device_put(self, eight_devices):
        from lisec_tpu.parallel import batch_sharding, make_mesh

        mesh = make_mesh(8)
        sh = batch_sharding(mesh)
        x = np.arange(16 * 5, dtype=np.float32).reshape(16, 5)
        via_put = jax.device_put(x, sh)
        # single-process: local data == global data
        via_local = jax.make_array_from_process_local_data(sh, x)
        np.testing.assert_array_equal(
            np.asarray(via_put), np.asarray(via_local))
        assert via_local.sharding == sh

    def test_initialize_distributed_single_process_noop(self):
        from lisec_tpu.parallel import initialize_distributed

        # No coordinator in this environment: must not raise, must
        # report that it skipped.
        assert initialize_distributed() in (False,)


def _dp_grads_check(cfg, batch_size, rtol, atol):
    """Pre-optimizer gradients from the 8-way sharded loss must equal
    the single-device gradients on the same batch (the DP contract at
    the gradient level, not just grad_norm / post-Adam params)."""
    import jax.numpy as jnp
    from lisec_tpu.data.collate import make_batches
    from lisec_tpu.parallel import batch_sharding, replicated_sharding

    pipe1 = _make(cfg, 1)
    pipe8 = _make(cfg, 8)
    state = pipe1.init_state(0)
    ds = pipe1.make_dataset("train")
    batch = next(make_batches(ds, cfg.budget, batch_size,
                              shuffle=False))
    rng = jax.random.PRNGKey(3)

    def grads(pipe):
        params = jax.device_put(state.params,
                                replicated_sharding(pipe.mesh))
        sharded = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x),
                                     batch_sharding(pipe.mesh)), batch)

        def loss_fn(p):
            return pipe.loss(p, state.batch_stats, sharded, rng,
                             train=True)
        (_, _), g = jax.jit(jax.value_and_grad(
            loss_fn, has_aux=True))(params)
        return jax.device_get(g)

    g1 = grads(pipe1)
    g8 = grads(pipe8)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            a, b, rtol=rtol, atol=atol), g1, g8)


def test_dp_grads_match_single_device_exactly(cfg, eight_devices):
    _dp_grads_check(cfg, cfg.train.batch_size, rtol=2e-4, atol=1e-6)


def test_dp_inference_matches_single_device(eight_devices):
    """VERDICT r4 #10: DP INFERENCE as an executed program — the
    8-way batch-sharded predict must return the same boxes as the
    single-device predict on the concatenated batch (the '10k = 8 x
    per-chip' extrapolation rests on this program, not arithmetic)."""
    from lisec_tpu.data.collate import make_batches

    det_cfg = load_config("configs/pointpillars_tiny.yaml")
    pipe1 = _make(det_cfg, 1)
    pipe8 = _make(det_cfg, 8)
    state = pipe1.init_state(0)
    ds = pipe1.make_dataset("train")
    batch = next(make_batches(ds, det_cfg.budget, 8, shuffle=False))
    batch = {k: batch[k] for k in ("points", "point_mask")}

    out1 = pipe1.infer(state, batch)
    out8 = pipe8.infer_dp(state, batch)
    np.testing.assert_array_equal(np.asarray(out8["valid"]),
                                  np.asarray(out1["valid"]))
    np.testing.assert_allclose(np.asarray(out8["boxes"]),
                               np.asarray(out1["boxes"]),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out8["scores"]),
                               np.asarray(out1["scores"]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("config_path,batch_size", [
    ("configs/pointpillars_tiny.yaml", 8),
    ("configs/second_tiny.yaml", 8),
])
def test_dp_grads_detection(config_path, batch_size, eight_devices):
    """VERDICT r4 #6: DP gradient equality THROUGH the detection
    pipelines' hand-written custom-VJP Pallas paint/spread/unpaint
    paths (PointPillars encoder, SECOND sparse conv) — a psum x
    custom_vjp interaction or batch-stat sharding bug in exactly these
    models would pass the cls-only test and the executes-only dryrun.
    Absolute tolerance is loose-ish because detection losses divide by
    num_pos, amplifying reduction-order noise; what this test pins is
    bit-level structural agreement, not float associativity."""
    det_cfg = load_config(config_path)
    _dp_grads_check(det_cfg, batch_size, rtol=5e-4, atol=5e-6)

"""Pipeline base: the training/inference contract every workload
implements (SURVEY.md §3.2/§3.3).

A pipeline owns the flax model, the loss, and the jitted step
functions. The train step is jitted over a data mesh with the batch
axis sharded and parameters replicated — XLA inserts the gradient
all-reduce over ICI (P1). ``infer`` compiles the full device program
(preprocess -> model -> postprocess) so inference is one round trip.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from lisec_tpu.config import Config
from lisec_tpu.parallel import (
    batch_sharding, make_mesh, replicated_sharding, shard_batch)
from lisec_tpu.training.optim import make_optimizer


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


class Pipeline:
    """Subclasses set ``self.model`` (flax Module) in __init__ and
    implement ``make_dataset``, ``dummy_batch``, ``loss`` and
    ``predict``."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.optimizer, self.schedule = make_optimizer(cfg.train)
        self.mesh = make_mesh(cfg.train.num_devices)
        self._train_step = None
        self._predict = None
        self._predict_packed = None
        self._predict_dp = None

    # -- subclass API ------------------------------------------------------

    def make_dataset(self, split: str):
        raise NotImplementedError

    def dummy_batch(self) -> Dict[str, np.ndarray]:
        raise NotImplementedError

    def loss(self, params, batch_stats, batch, rng,
             train: bool) -> Tuple[jax.Array, Tuple[Dict, Any]]:
        """Returns (loss, (aux_metrics, new_batch_stats))."""
        raise NotImplementedError

    def predict(self, params, batch_stats, batch) -> Dict[str, jax.Array]:
        """Inference outputs (argmax labels / decoded boxes...)."""
        raise NotImplementedError

    def augment_fn(self, split: str):
        """Host-side augmentation hook; None = no augmentation."""
        return None

    # -- provided machinery ------------------------------------------------

    def init_state(self, seed: int = 0) -> TrainState:
        batch = jax.tree.map(jnp.asarray, self.dummy_batch())
        rng = jax.random.PRNGKey(seed)
        variables = self.init_variables(rng, batch)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", FrozenDict())
        opt_state = self.optimizer.init(params)
        return TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=batch_stats, opt_state=opt_state)

    def init_variables(self, rng, batch):
        raise NotImplementedError

    def train_step(self, state: TrainState, batch, rng) -> Tuple[
            TrainState, Dict[str, jax.Array]]:
        if self._train_step is None:
            rep = replicated_sharding(self.mesh)
            data = batch_sharding(self.mesh)

            @functools.partial(
                jax.jit,
                in_shardings=(rep, data, rep),
                out_shardings=(rep, rep),
                donate_argnums=(0,))
            def step(state, batch, rng):
                def loss_fn(params):
                    return self.loss(params, state.batch_stats, batch,
                                     rng, train=True)

                (loss, (aux, new_bs)), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(state.params)
                updates, opt_state = self.optimizer.update(
                    grads, state.opt_state, state.params)
                params = optax.apply_updates(state.params, updates)
                aux = dict(aux)
                aux["loss"] = loss
                aux["grad_norm"] = optax.global_norm(grads)
                new_state = TrainState(
                    step=state.step + 1, params=params,
                    batch_stats=new_bs, opt_state=opt_state)
                return new_state, aux

            self._train_step = step
        batch = shard_batch(batch, self.mesh)
        return self._train_step(state, batch, rng)

    def infer(self, state: TrainState, batch) -> Dict[str, jax.Array]:
        """One-round-trip inference: batch in, outputs out."""
        if self._predict is None:
            self._predict = jax.jit(self.predict)
        batch = jax.tree.map(jnp.asarray, batch)
        return self._predict(state.params, state.batch_stats, batch)

    def infer_dp(self, state: TrainState, batch) -> Dict[str, jax.Array]:
        """Data-parallel batched inference over the pipeline's mesh
        (BASELINE.json:5 "clouds/sec/chip" is an inference-DP claim —
        this is the executed program behind the 8-chip extrapolation,
        not arithmetic). The batch axis is sharded over `data`; params
        are replicated; each chip runs the identical per-cloud program
        with NO cross-chip collectives in the forward path, so
        throughput scales as chips x per-chip throughput minus input
        staging. Outputs come back batch-sharded."""
        if self._predict_dp is None:
            rep = replicated_sharding(self.mesh)
            data = batch_sharding(self.mesh)
            self._predict_dp = jax.jit(
                self.predict, in_shardings=(rep, rep, data),
                out_shardings=data)
        return self._predict_dp(state.params, state.batch_stats,
                                self.device_batch(batch))

    def infer_packed(self, state: TrainState, packed) -> Dict[str, jax.Array]:
        """One-round-trip inference from the int16 wire format
        (data/wire.py): ~2x fewer host->device bytes than `infer`,
        dequantized to f32 inside the jitted program. Use
        `data.wire.pack_points_q16` on the host side."""
        if self._predict_packed is None:
            from lisec_tpu.data.wire import unpack_points_q16

            def predict_packed(params, batch_stats, packed):
                return self.predict(params, batch_stats,
                                    unpack_points_q16(packed))
            self._predict_packed = jax.jit(predict_packed)
        packed = jax.tree.map(jnp.asarray, packed)
        return self._predict_packed(
            state.params, state.batch_stats, packed)

    # -- helpers -----------------------------------------------------------

    def device_batch(self, batch: Dict[str, np.ndarray]):
        return shard_batch(batch, self.mesh)

"""R1 — training loop (SURVEY.md §2.5 R1, §3.2).

Host feeds fixed-shape batches; the jitted train step runs on the data
mesh (fwd+bwd+update, grads all-reduced over ICI by XLA). Hooks:
JSONL metrics logging (§5.5), orbax checkpointing with ``--resume
auto`` (§5.4), periodic eval.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from lisec_tpu.config import Config


class MetricsLogger:
    """Structured JSONL metrics writer, with an optional TensorBoard
    scalar mirror (SURVEY.md §5.5; utils/tb_writer.py)."""

    def __init__(self, path: Optional[str], tensorboard: bool = False):
        self.path = path
        self.file = None
        self.tb = None
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self.file = open(path, "a")
            if tensorboard:
                from lisec_tpu.utils.tb_writer import TensorBoardWriter
                self.tb = TensorBoardWriter(
                    os.path.join(os.path.dirname(path) or ".", "tb"))

    def log(self, record: Dict) -> None:
        if self.file:
            self.file.write(json.dumps(record) + "\n")
            self.file.flush()
        if self.tb:
            step = int(record.get("step", 0))
            self.tb.write_scalars(
                step, {k: v for k, v in record.items() if k != "step"})

    def close(self) -> None:
        if self.file:
            self.file.close()
        if self.tb:
            self.tb.close()


def run_training(cfg: Config, *, progress: bool = True):
    """Train per config; returns (pipeline, final_state, history)."""
    from lisec_tpu.api import build_model
    from lisec_tpu.data.collate import make_batches
    from lisec_tpu.training.checkpoint import CheckpointManager

    if cfg.train.debug_nans:
        jax.config.update("jax_debug_nans", True)

    # P2 — multi-host launcher: must run before any backend use so the
    # mesh spans the global device list (SURVEY.md §2.4).
    if cfg.train.multihost:
        from lisec_tpu.parallel import initialize_distributed
        initialize_distributed(
            coordinator_address=cfg.train.coordinator or None,
            num_processes=cfg.train.num_processes or None,
            process_id=(cfg.train.process_id
                        if cfg.train.process_id >= 0 else None))

    pipeline = build_model(cfg)
    state = pipeline.init_state(cfg.train.seed)

    ckpt = None
    if cfg.train.ckpt_dir:
        ckpt = CheckpointManager(
            cfg.train.ckpt_dir, keep=cfg.train.ckpt_keep,
            every=cfg.train.ckpt_every)
        if cfg.train.resume:
            restored = ckpt.restore(state)
            if restored is not None:
                state = restored

    logger = MetricsLogger(
        os.path.join(cfg.train.ckpt_dir, "metrics.jsonl")
        if cfg.train.ckpt_dir else None,
        tensorboard=cfg.train.tensorboard)

    from lisec_tpu.data.collate import prefetch

    dataset = pipeline.make_dataset("train")
    # P3 — per-host shard of the example list + local batch slice; the
    # global batch is assembled in shard_batch via
    # make_array_from_process_local_data (parallel/mesh.py).
    local_batch_size = cfg.train.batch_size
    if jax.process_count() > 1:
        from lisec_tpu.parallel import ProcessShardDataset
        dataset = ProcessShardDataset(dataset)
        assert cfg.train.batch_size % jax.process_count() == 0, (
            "global batch size must divide evenly across hosts")
        local_batch_size = cfg.train.batch_size // jax.process_count()
    rng = jax.random.PRNGKey(cfg.train.seed + 17)
    history = []
    start_step = int(state.step)
    # The data stream is seekable (shuffle/augment RNG derive from the
    # step index — collate.make_batches), so resuming realigns in O(1):
    # "train N" == "train k, resume, train N-k" exactly (SURVEY.md §5.4).
    batches = prefetch(make_batches(
        dataset, cfg.budget, local_batch_size,
        shuffle=True, seed=cfg.train.seed + jax.process_index(),
        augment_fn=pipeline.augment_fn("train"),
        start_batch=start_step))
    t0 = time.time()
    samples_done = 0

    for step in range(start_step, cfg.train.num_steps):
        batch = next(batches)
        step_rng = jax.random.fold_in(rng, step)
        state, aux = pipeline.train_step(state, batch, step_rng)
        samples_done += cfg.train.batch_size

        if (step + 1) % cfg.train.log_every == 0 or step == start_step:
            aux_host = {k: float(v) for k, v in aux.items()}
            elapsed = time.time() - t0
            rec = {
                "step": step + 1,
                "lr": float(pipeline.schedule(step)),
                "clouds_per_sec": samples_done / max(elapsed, 1e-9),
                **aux_host,
            }
            history.append(rec)
            logger.log(rec)
            if progress:
                msg = " ".join(
                    f"{k}={v:.4g}" for k, v in rec.items()
                    if isinstance(v, float))
                print(f"[train {step + 1}/{cfg.train.num_steps}] {msg}",
                      flush=True)

        if ckpt is not None and ckpt.should_save(step + 1):
            # device_get pulls the full params+opt_state to host — only
            # pay that (and the implied sync) when the manager will
            # actually accept the save.
            ckpt.save(step + 1, jax.device_get(state))

        if cfg.train.eval_every and (step + 1) % cfg.train.eval_every == 0 \
                and hasattr(pipeline, "evaluate"):
            metrics = pipeline.evaluate(state)
            rec = {"step": step + 1, "eval": metrics}
            history.append(rec)
            logger.log(rec)
            if progress:
                print(f"[eval {step + 1}] {metrics}", flush=True)

    if ckpt is not None:
        if ckpt.latest_step() != cfg.train.num_steps:
            ckpt.save(cfg.train.num_steps, jax.device_get(state),
                      force=True)
        ckpt.wait()
        ckpt.close()
    logger.close()
    return pipeline, state, history


def run_evaluation(cfg: Config, *, state=None):
    """Evaluate a config (restoring the latest checkpoint if needed)."""
    from lisec_tpu.api import build_model
    from lisec_tpu.training.checkpoint import CheckpointManager

    pipeline = build_model(cfg)
    if state is None:
        state = pipeline.init_state(cfg.train.seed)
        if cfg.train.ckpt_dir:
            ckpt = CheckpointManager(cfg.train.ckpt_dir)
            restored = ckpt.restore(state)
            if restored is not None:
                state = restored
            ckpt.close()
    metrics = pipeline.evaluate(state)
    print(json.dumps(metrics, indent=2))
    return metrics

"""R4 — optimizer & LR schedule factory (SURVEY.md §2.5 R4).

optax: Adam/AdamW/SGD with one-cycle (detection), step decay (cls/seg),
cosine, or constant schedules, plus global-norm gradient clipping.
"""

from __future__ import annotations

import optax

from lisec_tpu.config import TrainConfig


def make_schedule(cfg: TrainConfig):
    if cfg.schedule == "onecycle":
        return optax.cosine_onecycle_schedule(
            transition_steps=cfg.num_steps,
            peak_value=cfg.lr,
            pct_start=cfg.warmup_frac,
            div_factor=10.0,
            final_div_factor=100.0,
        )
    if cfg.schedule == "cosine":
        warmup = max(int(cfg.num_steps * cfg.warmup_frac), 1)
        return optax.warmup_cosine_decay_schedule(
            init_value=cfg.lr / 10, peak_value=cfg.lr,
            warmup_steps=warmup, decay_steps=cfg.num_steps)
    if cfg.schedule == "step":
        every = cfg.step_decay_every or max(cfg.num_steps // 3, 1)
        return optax.exponential_decay(
            cfg.lr, transition_steps=every,
            decay_rate=cfg.step_decay_rate, staircase=True)
    if cfg.schedule == "constant":
        return optax.constant_schedule(cfg.lr)
    raise ValueError(f"unknown schedule {cfg.schedule!r}")


def make_optimizer(cfg: TrainConfig):
    schedule = make_schedule(cfg)
    if cfg.optimizer == "adamw":
        opt = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "adam":
        opt = optax.adam(schedule)
    elif cfg.optimizer == "sgd":
        opt = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")
    if cfg.grad_clip_norm > 0:
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip_norm), opt)
    return opt, schedule

"""Workload 1 — PointNet classification on ModelNet40
(SURVEY.md §2.2 M1; BASELINE.json:7). The minimum end-to-end slice:
no custom kernels, proves L0-L7 plumbing on the real chip.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from lisec_tpu.config import Config
from lisec_tpu.data.augment import augment_cloud
from lisec_tpu.data.modelnet40 import ModelNet40
from lisec_tpu.models.pointnet import PointNetCls, orthogonality_loss
from lisec_tpu.models.pointnet2 import PointNet2Cls
from lisec_tpu.pipelines.base import Pipeline
from lisec_tpu.registry import register_pipeline, register_model
from lisec_tpu.training.losses import cross_entropy
from lisec_tpu.training.metrics import AccuracyMeter

register_model("pointnet_cls")(PointNetCls)
register_model("pointnet2_cls")(PointNet2Cls)


@register_pipeline("pointnet_cls")
class PointNetClsPipeline(Pipeline):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        p = cfg.model.params
        self.model = PointNetCls(
            num_classes=cfg.data.num_classes,
            use_input_tnet=bool(p.get("use_input_tnet", True)),
            use_feature_tnet=bool(p.get("use_feature_tnet", True)),
            dropout_rate=float(p.get("dropout_rate", 0.4)),
        )
        self.reg_weight = float(p.get("reg_weight", 1e-3))

    def make_dataset(self, split: str):
        return ModelNet40(self.cfg, split)

    def augment_fn(self, split: str):
        if split != "train" or not self.cfg.data.augment.enabled:
            return None
        aug = self.cfg.data.augment
        return lambda sample, rng: augment_cloud(sample, rng, aug)

    def dummy_batch(self) -> Dict[str, np.ndarray]:
        b = self.cfg.train.batch_size
        n = self.cfg.budget.max_points
        return {
            "points": np.zeros((b, n, 3), np.float32),
            "point_mask": np.ones((b, n), bool),
            "label": np.zeros((b,), np.int32),
        }

    def init_variables(self, rng, batch):
        return self.model.init(
            {"params": rng}, batch["points"], batch["point_mask"],
            train=False)

    def loss(self, params, batch_stats, batch, rng, train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        out, mutated = self.model.apply(
            variables, batch["points"], batch["point_mask"], train=train,
            mutable=["batch_stats"] if train else [],
            rngs={"dropout": rng} if train else {})
        ce = cross_entropy(out["logits"], batch["label"])
        reg = orthogonality_loss(out["feature_transform"])
        loss = ce + self.reg_weight * reg
        acc = jnp.mean(
            (jnp.argmax(out["logits"], -1) == batch["label"]).astype(
                jnp.float32))
        new_bs = mutated.get("batch_stats", batch_stats) if train \
            else batch_stats
        return loss, ({"ce": ce, "reg": reg, "acc": acc}, new_bs)

    def predict(self, params, batch_stats, batch):
        out = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["points"], batch["point_mask"], train=False)
        return {
            "logits": out["logits"],
            "labels": jnp.argmax(out["logits"], -1).astype(jnp.int32),
        }

    def evaluate(self, state, max_batches: int = 0) -> Dict[str, float]:
        from lisec_tpu.data.collate import make_batches
        ds = self.make_dataset("test")
        meter = AccuracyMeter(self.cfg.data.num_classes)
        n = 0
        for batch in make_batches(
                ds, self.cfg.budget, self.cfg.train.batch_size,
                shuffle=False, epochs=1):
            out = self.infer(state, batch)
            meter.update(np.asarray(out["labels"]), batch["label"])
            n += 1
            if max_batches and n >= max_batches:
                break
        return {"accuracy": meter.overall(),
                "class_mean_accuracy": meter.class_mean()}


@register_pipeline("pointnet2_cls")
class PointNet2ClsPipeline(PointNetClsPipeline):
    """PointNet++ SSG classification (ModelNet40) — same pipeline with
    the hierarchical set-abstraction network (SURVEY.md M2 family;
    exercises O2/O3/O4 on the classification workload)."""

    def __init__(self, cfg: Config):
        Pipeline.__init__(self, cfg)
        p = cfg.model.params
        self.model = PointNet2Cls(
            num_classes=cfg.data.num_classes,
            width=int(p.get("width", 1)))
        self.reg_weight = 0.0

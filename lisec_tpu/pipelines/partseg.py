"""Workload 2 — PointNet++ part segmentation on ShapeNetPart
(SURVEY.md §3.4; BASELINE.json:8). Exercises the sampling/grouping hot
path: O2 FPS -> O3 ball query -> O4 grouping -> O5 three-interpolate.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from lisec_tpu.config import Config
from lisec_tpu.data.augment import augment_cloud
from lisec_tpu.data.shapenetpart import ShapeNetPart
from lisec_tpu.models.pointnet2 import PointNet2PartSeg
from lisec_tpu.pipelines.base import Pipeline
from lisec_tpu.registry import register_model, register_pipeline
from lisec_tpu.training.losses import cross_entropy
from lisec_tpu.training.metrics import IoUMeter

register_model("pointnet2_partseg")(PointNet2PartSeg)


@register_pipeline("pointnet2_partseg")
class PointNet2PartSegPipeline(Pipeline):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        p = cfg.model.params
        self.num_categories = int(p.get("num_categories", 16))
        self.parts_per_cat = int(p.get("parts_per_cat", 3))
        self.num_parts = int(
            p.get("num_parts", self.num_categories * self.parts_per_cat))
        self.model = PointNet2PartSeg(
            num_parts=self.num_parts,
            num_categories=self.num_categories,
            width=int(p.get("width", 1)),
            msg=bool(p.get("msg", False)))

    def make_dataset(self, split: str):
        return ShapeNetPart(self.cfg, split)

    def augment_fn(self, split: str):
        if split != "train" or not self.cfg.data.augment.enabled:
            return None
        aug = self.cfg.data.augment
        return lambda s, rng: augment_cloud(s, rng, aug)

    def dummy_batch(self) -> Dict[str, np.ndarray]:
        b = self.cfg.train.batch_size
        n = self.cfg.budget.max_points
        return {
            "points": np.zeros((b, n, 3), np.float32),
            "point_mask": np.ones((b, n), bool),
            "point_labels": np.zeros((b, n), np.int32),
            "category": np.zeros((b,), np.int32),
        }

    def _onehot(self, category):
        return jax.nn.one_hot(category, self.num_categories)

    def init_variables(self, rng, batch):
        return self.model.init(
            {"params": rng}, batch["points"], batch["point_mask"],
            self._onehot(batch["category"]), train=False)

    def loss(self, params, batch_stats, batch, rng, train: bool):
        variables = {"params": params, "batch_stats": batch_stats}
        logits, mutated = self.model.apply(
            variables, batch["points"], batch["point_mask"],
            self._onehot(batch["category"]), train=train,
            mutable=["batch_stats"] if train else [],
            rngs={"dropout": rng} if train else {})
        ce = cross_entropy(logits, batch["point_labels"],
                           mask=batch["point_mask"])
        pred = jnp.argmax(logits, -1)
        valid = batch["point_mask"] & (batch["point_labels"] >= 0)
        acc = jnp.sum((pred == batch["point_labels"]) & valid) \
            / jnp.maximum(jnp.sum(valid), 1)
        new_bs = mutated.get("batch_stats", batch_stats) if train \
            else batch_stats
        return ce, ({"acc": acc}, new_bs)

    def predict(self, params, batch_stats, batch):
        logits = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["points"], batch["point_mask"],
            self._onehot(batch["category"]), train=False)
        return {
            "logits": logits,
            "labels": jnp.argmax(logits, -1).astype(jnp.int32),
        }

    def evaluate(self, state, max_batches: int = 0) -> Dict[str, float]:
        from lisec_tpu.data.collate import make_batches
        from lisec_tpu.training.metrics import instance_miou

        ds = self.make_dataset("test")
        meter = IoUMeter(self.num_parts)
        inst_preds, inst_labels, inst_parts = [], [], []
        n = 0
        for batch in make_batches(
                ds, self.cfg.budget, self.cfg.train.batch_size,
                shuffle=False, epochs=1):
            out = self.infer(state, batch)
            pred = np.asarray(out["labels"])
            label = batch["point_labels"]
            m = batch["point_mask"]
            for i in range(len(pred)):
                meter.update(pred[i][m[i]], label[i][m[i]])
                inst_preds.append(pred[i][m[i]])
                inst_labels.append(label[i][m[i]])
                cat = int(batch["category"][i])
                inst_parts.append(range(
                    cat * self.parts_per_cat,
                    (cat + 1) * self.parts_per_cat))
            n += 1
            if max_batches and n >= max_batches:
                break
        return {
            "class_miou": meter.miou(),
            "instance_miou": instance_miou(
                inst_preds, inst_labels, inst_parts),
        }

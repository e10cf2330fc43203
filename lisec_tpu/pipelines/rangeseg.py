"""Workload 5 — SemanticKITTI range-image segmentation
(SURVEY.md §3.5; BASELINE.json:11).

The jitted device program: O12 range projection -> M5 encoder-decoder
-> per-pixel logits -> O13 range-window kNN refinement -> per-POINT
labels. The reference class does the un-projection on host
[UNOBSERVABLE]; here it stays on device so a scan makes one round trip.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from lisec_tpu.config import Config
from lisec_tpu.data.semantickitti import SemanticKitti
from lisec_tpu.models.rangeseg import RangeSegNet
from lisec_tpu.ops.knn_refine import knn_refine_batch
from lisec_tpu.ops.range_proj import range_project
from lisec_tpu.pipelines.base import Pipeline
from lisec_tpu.registry import register_model, register_pipeline
from lisec_tpu.training.losses import cross_entropy, lovasz_softmax
from lisec_tpu.training.metrics import IoUMeter

register_model("rangeseg")(RangeSegNet)


@register_pipeline("rangeseg")
class RangeSegPipeline(Pipeline):
    def __init__(self, cfg: Config):
        super().__init__(cfg)
        p = cfg.model.params
        self.num_classes = cfg.data.num_classes or 20
        self.height = int(p.get("height", 64))
        self.width = int(p.get("width", 2048))
        self.fov_up = float(p.get("fov_up_deg", 3.0))
        self.fov_down = float(p.get("fov_down_deg", -25.0))
        self.knn_k = int(p.get("knn_k", 5))
        self.knn_window = int(p.get("knn_window", 5))
        self.lovasz_weight = float(p.get("lovasz_weight", 1.0))
        self.model = RangeSegNet(
            num_classes=self.num_classes,
            widths=tuple(p.get("widths", [32, 64, 128, 256])),
            dtype=jnp.dtype(p.get("dtype", "float32")))

    def make_dataset(self, split: str):
        return SemanticKitti(self.cfg, split)

    def dummy_batch(self) -> Dict[str, np.ndarray]:
        b = self.cfg.train.batch_size
        n = self.cfg.budget.max_points
        return {
            "points": np.zeros((b, n, 4), np.float32),
            "point_mask": np.ones((b, n), bool),
            "point_labels": np.zeros((b, n), np.int32),
        }

    def _project(self, points, point_mask):
        # Sort+paint O12 (round 5): output-identical to the vmapped
        # two-scatter reference but off the ~2 GB/s scatter ceiling
        # (32.3 -> ~5 ms/batch-8 at the 131072-point budget).
        from lisec_tpu.ops.range_proj import range_project_batch
        interpret = jax.devices()[0].platform != "tpu"
        return range_project_batch(
            points, point_mask, height=self.height, width=self.width,
            fov_up_deg=self.fov_up, fov_down_deg=self.fov_down,
            interpret=interpret)

    def _label_image(self, proj, point_labels):
        """Per-pixel training labels from per-point ones via the
        projection's winner index (-1 where no point)."""
        def one(winner, labels):
            n = labels.shape[0]
            lab_pad = jnp.concatenate(
                [labels, jnp.full((1,), -1, labels.dtype)])
            return lab_pad[jnp.minimum(winner, n)]
        return jax.vmap(one)(proj.winner_idx, point_labels)

    def init_variables(self, rng, batch):
        proj = self._project(batch["points"], batch["point_mask"])
        return self.model.init({"params": rng}, proj.image, train=False)

    def loss(self, params, batch_stats, batch, rng, train: bool):
        proj = self._project(batch["points"], batch["point_mask"])
        variables = {"params": params, "batch_stats": batch_stats}
        logits, mutated = self.model.apply(
            variables, proj.image, train=train,
            mutable=["batch_stats"] if train else [])
        labels = self._label_image(proj, batch["point_labels"])
        pix_mask = proj.image_mask & (labels >= 0)

        ce = cross_entropy(logits, labels, mask=pix_mask)
        lov = lovasz_softmax(
            jax.nn.softmax(logits, -1), labels,
            num_classes=self.num_classes, mask=pix_mask)
        loss = ce + self.lovasz_weight * lov

        pred = jnp.argmax(logits, -1)
        acc = jnp.sum((pred == labels) & pix_mask) \
            / jnp.maximum(jnp.sum(pix_mask), 1)
        new_bs = mutated.get("batch_stats", batch_stats) if train \
            else batch_stats
        return loss, ({"ce": ce, "lovasz": lov, "acc": acc}, new_bs)

    def predict(self, params, batch_stats, batch):
        proj = self._project(batch["points"], batch["point_mask"])
        logits = self.model.apply(
            {"params": params, "batch_stats": batch_stats},
            proj.image, train=False)
        pixel_labels = jnp.argmax(logits, -1).astype(jnp.int32)

        point_labels = knn_refine_batch(
            proj.point_range, proj.pixel_pix, proj.image[..., 0],
            pixel_labels, proj.image_mask,
            window=self.knn_window, k=self.knn_k,
            num_classes=self.num_classes)
        return {
            "labels": point_labels,
            "pixel_labels": pixel_labels,
        }

    def evaluate(self, state, max_batches: int = 0) -> Dict[str, float]:
        from lisec_tpu.data.collate import make_batches
        ds = self.make_dataset("val")
        meter = IoUMeter(self.num_classes)
        n = 0
        for batch in make_batches(
                ds, self.cfg.budget, self.cfg.train.batch_size,
                shuffle=False, epochs=1):
            out = self.infer(state, batch)
            pred = np.asarray(out["labels"])
            for i in range(len(pred)):
                m = batch["point_mask"][i] & (batch["point_labels"][i] >= 0)
                meter.update(pred[i][m], batch["point_labels"][i][m])
            n += 1
            if max_batches and n >= max_batches:
                break
        return {"miou": meter.miou(skip_class_0=True),
                "miou_all": meter.miou()}

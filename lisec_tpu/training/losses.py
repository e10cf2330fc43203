"""R2 — losses (SURVEY.md §2.5 R2).

Classification / segmentation: (weighted) cross-entropy, the PointNet
orthogonality regularizer, Lovász-softmax for range segmentation.
Detection: focal loss (alpha=0.25, gamma=2), smooth-L1 with the SECOND
sin-difference angle trick, direction-classifier CE — weights
beta_loc=2, beta_cls=1, beta_dir=0.2 [arch, PAPERS.md:6].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits, labels, *, mask=None, class_weights=None):
    """Mean CE over valid entries. labels: int; mask: same leading shape."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits, jnp.maximum(labels, 0))
    if class_weights is not None:
        ce = ce * class_weights[jnp.maximum(labels, 0)]
    if mask is None:
        mask = labels >= 0
    else:
        mask = mask & (labels >= 0)
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, ce, 0.0)) / denom


def sigmoid_focal_loss(logits, targets, *, alpha: float = 0.25,
                       gamma: float = 2.0):
    """Per-element focal loss (RetinaNet form). targets in {0, 1}."""
    p = jax.nn.sigmoid(logits)
    ce = optax.sigmoid_binary_cross_entropy(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    a_t = alpha * targets + (1 - alpha) * (1 - targets)
    return a_t * ((1 - p_t) ** gamma) * ce


def smooth_l1(pred, target, *, beta: float = 1.0 / 9.0):
    """Huber/smooth-L1 per element."""
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta,
                     diff - 0.5 * beta)


def sin_difference(pred_boxes, target_boxes):
    """SECOND's angle trick: replace (rp, rt) by
    (sin(rp)cos(rt), cos(rp)sin(rt)) so the loss sees sin(rp - rt)."""
    rp, rt = pred_boxes[..., 6:7], target_boxes[..., 6:7]
    pred = jnp.concatenate(
        [pred_boxes[..., :6], jnp.sin(rp) * jnp.cos(rt)], axis=-1)
    target = jnp.concatenate(
        [target_boxes[..., :6], jnp.cos(rp) * jnp.sin(rt)], axis=-1)
    return pred, target


def sin_difference_cols(pred_boxes, target_boxes):
    """:func:`sin_difference` on channel-leading (..., 7, N) columns
    (box channels on sublanes — see ops/boxes.py::encode_boxes_cols)."""
    rp, rt = pred_boxes[..., 6:7, :], target_boxes[..., 6:7, :]
    pred = jnp.concatenate(
        [pred_boxes[..., :6, :], jnp.sin(rp) * jnp.cos(rt)], axis=-2)
    target = jnp.concatenate(
        [target_boxes[..., :6, :], jnp.cos(rp) * jnp.sin(rt)], axis=-2)
    return pred, target


def lovasz_softmax(probs, labels, *, num_classes: int, mask=None):
    """Lovász-softmax over flattened pixels/points (range seg).

    probs: (..., C) softmax probabilities; labels: (...,) int.
    Direct implementation of the Lovász extension of IoU.
    """
    probs = probs.reshape(-1, num_classes)
    labels = labels.reshape(-1)
    if mask is None:
        mask = labels >= 0
    else:
        mask = mask.reshape(-1) & (labels >= 0)
    labels_safe = jnp.maximum(labels, 0)

    valid = mask.astype(probs.dtype)

    def class_loss(c):
        fg = ((labels_safe == c) & mask).astype(probs.dtype)
        errors = jnp.where(mask, jnp.abs(fg - probs[:, c]), 0.0)
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        fg_sorted = fg[order]
        valid_sorted = valid[order]
        gts = jnp.sum(fg)
        inter = gts - jnp.cumsum(fg_sorted)
        union = gts + jnp.cumsum(valid_sorted - fg_sorted)
        jaccard = 1.0 - inter / jnp.maximum(union, 1e-6)
        grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
        present = gts > 0
        return jnp.where(present, jnp.sum(errors_sorted * grad), 0.0), \
            present.astype(probs.dtype)

    losses, present = jax.vmap(class_loss)(jnp.arange(num_classes))
    return jnp.sum(losses) / jnp.maximum(jnp.sum(present), 1.0)

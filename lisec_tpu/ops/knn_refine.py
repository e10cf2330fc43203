"""O13 — range-window kNN label refinement (SURVEY.md §2.3 O13).

Reference form: CUDA windowed kNN vote (RangeNet++-style post-process).
TPU-native design: for each point, gather the S x S pixel window around
its projected (v, u) from the label/range images (one fused gather),
take the k nearest neighbors by |range difference| with ``top_k``, and
vote with inverse-distance weights over classes. Static shapes: (N, S*S)
window, fixed k, fixed class count. Runs inside the jitted inference
program — per-POINT labels leave the device, not per-pixel ones
(SURVEY.md §3.5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("window", "k", "num_classes"))
def knn_refine(
    point_range: jax.Array,
    pixel_uv: jax.Array,
    image_range: jax.Array,
    image_labels: jax.Array,
    image_mask: jax.Array,
    *,
    window: int = 5,
    k: int = 5,
    num_classes: int = 20,
    cutoff: float = 1.0,
) -> jax.Array:
    """Refine per-pixel argmax labels into per-point labels.

    point_range: (N,); pixel_uv: (N, 2) int32 (v, u);
    image_range: (H, W); image_labels: (H, W) int32; image_mask: (H, W).
    Returns (N,) int32 labels.
    """
    h, w = image_range.shape
    half = window // 2
    dv, du = jnp.meshgrid(
        jnp.arange(-half, half + 1), jnp.arange(-half, half + 1),
        indexing="ij")
    dv = dv.reshape(-1)
    du = du.reshape(-1)                                   # (S2,)

    v = jnp.clip(pixel_uv[:, 0:1] + dv[None, :], 0, h - 1)  # (N, S2)
    u = jnp.clip(pixel_uv[:, 1:2] + du[None, :], 0, w - 1)
    nbr_range = image_range[v, u]                          # (N, S2)
    nbr_label = image_labels[v, u]
    nbr_valid = image_mask[v, u]

    dr = jnp.abs(nbr_range - point_range[:, None])
    big = jnp.array(jnp.finfo(dr.dtype).max, dr.dtype)
    dr = jnp.where(nbr_valid & (dr < cutoff), dr, big)

    neg_d, sel = jax.lax.top_k(-dr, k)                     # (N, k)
    d = -neg_d
    lbl = jnp.take_along_axis(nbr_label, sel, axis=1)      # (N, k)
    wgt = jnp.where(d < big, 1.0 / (d + 1e-3), 0.0)

    votes = jnp.zeros((point_range.shape[0], num_classes), wgt.dtype)
    votes = jax.vmap(lambda vv, ll, ww: vv.at[ll].add(ww, mode="drop"))(
        votes, lbl, wgt)
    refined = jnp.argmax(votes, axis=-1).astype(jnp.int32)
    # Points whose whole window is invalid keep the raw projected label.
    fallback = image_labels[pixel_uv[:, 0], pixel_uv[:, 1]]
    has_vote = jnp.sum(wgt, axis=-1) > 0
    return jnp.where(has_vote, refined, fallback)

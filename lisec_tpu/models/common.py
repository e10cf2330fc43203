"""M6 — shared NN blocks (SURVEY.md §2.2 M6).

Shared MLPs are pointwise Dense layers (a 1x1 conv on TPU is just a
matmul over the channel axis — exactly what the MXU wants); BatchNorm
follows the canonical PointNet-family training recipe. Modules are flax
linen; running stats live in the ``batch_stats`` collection.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn


class SharedMLP(nn.Module):
    """Pointwise MLP: Dense + BN + ReLU per layer over the last axis."""

    features: Sequence[int]
    use_bn: bool = True
    activate_final: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, f in enumerate(self.features):
            x = nn.Dense(f, use_bias=not self.use_bn)(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9)(x)
            if i < len(self.features) - 1 or self.activate_final:
                x = nn.relu(x)
        return x


class MLPHead(nn.Module):
    """FC head with BN + dropout between layers (classifier style)."""

    features: Sequence[int]
    out_dim: int
    dropout_rate: float = 0.4
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in self.features:
            x = nn.Dense(f, use_bias=not self.use_bn)(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9)(x)
            x = nn.relu(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        return nn.Dense(self.out_dim)(x)


class ConvBNRelu(nn.Module):
    """2D conv + BN + ReLU for BEV / range-image backbones (NHWC).

    ``dtype`` is the compute dtype (bfloat16 keeps the convs on the
    MXU's fast path; params stay float32).
    """

    features: int
    kernel: int = 3
    stride: int = 1
    transpose: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.transpose:
            x = nn.ConvTranspose(
                self.features, (self.kernel, self.kernel),
                strides=(self.stride, self.stride), use_bias=False,
                dtype=self.dtype)(x)
        else:
            x = nn.Conv(
                self.features, (self.kernel, self.kernel),
                strides=(self.stride, self.stride), use_bias=False,
                dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                         epsilon=1e-3, dtype=self.dtype)(x)
        return nn.relu(x)


def masked_max(x: jnp.ndarray, mask: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Max over `axis` of x counting only masked-true entries (else 0).

    x: (..., N, C); mask: (..., N) — `axis` indexes into x and must not
    be the channel axis.
    """
    axis = axis % x.ndim           # normalize so it indexes mask too
    neg = jnp.finfo(x.dtype).min
    m = jnp.expand_dims(mask, -1).astype(bool)
    y = jnp.max(jnp.where(m, x, neg), axis=axis)
    any_valid = jnp.any(mask, axis=axis)[..., None]
    return jnp.where(any_valid, y, 0.0)

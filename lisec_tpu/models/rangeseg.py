"""M5 — range-image semantic segmentation (SURVEY.md §2.2 M5;
config 5, BASELINE.json:11).

Canonical architecture class [arch]: RangeNet/SalsaNext-style 2D
encoder-decoder over the spherical projection (H=64 x W=1024/2048,
5 channels: range, x, y, z, remission), followed by the per-point
range-aware kNN vote (O13) to un-project pixel labels to the full
cloud. The 2D convs are plain MXU work; the projection and refinement
are the O12/O13 device ops, so per-POINT labels leave the chip
(SURVEY.md §3.5).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from lisec_tpu.models.common import ConvBNRelu


class _ResBlock(nn.Module):
    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = ConvBNRelu(self.features, kernel=3, dtype=self.dtype)(x, train)
        h = ConvBNRelu(self.features, kernel=3, dtype=self.dtype)(h, train)
        if x.shape[-1] != self.features:
            x = nn.Conv(self.features, (1, 1), use_bias=False,
                        dtype=self.dtype)(x)
        return x + h


class RangeSegNet(nn.Module):
    """Encoder-decoder with skip connections over the range image.

    Downsampling is width-heavy ((1, 2) strides after the first level)
    because lidar range images are much wider than tall.
    """

    num_classes: int = 20
    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, image, train: bool = False):
        """image (B, H, W, 5) -> logits (B, H, W, num_classes)."""
        x = image.astype(self.dtype)
        x = ConvBNRelu(self.widths[0], kernel=3, dtype=self.dtype)(x, train)
        skips = []
        for i, w in enumerate(self.widths[1:]):
            skips.append(x)
            stride = (2, 2) if i == 0 else (1, 2)
            x = nn.Conv(w, (3, 3), strides=stride, use_bias=False,
                        dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1e-3,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
            x = _ResBlock(w, self.dtype)(x, train)

        for i, skip in enumerate(reversed(skips)):
            w = skip.shape[-1]
            stride = (1, 2) if i < len(skips) - 1 else (2, 2)
            x = nn.ConvTranspose(w, (3, 3), strides=stride,
                                 use_bias=False, dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.99, epsilon=1e-3,
                             dtype=self.dtype)(x)
            x = nn.relu(x)
            x = _ResBlock(w, self.dtype)(x + skip, train)

        logits = nn.Conv(self.num_classes, (1, 1))(x)
        return logits.astype(jnp.float32)

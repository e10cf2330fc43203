"""M1 — PointNet classifier (SURVEY.md §2.2 M1; config 1, BASELINE.json:7).

Canonical architecture [arch]: input T-Net (3x3), shared MLP(64, 64),
feature T-Net (64x64), shared MLP(64, 128, 1024), masked global
max-pool, FC(512, 256, num_classes) with dropout + BN, and the
orthogonality regularizer on the feature transform. No custom ops —
pure MXU matmuls, which is why the reference runs this workload on CPU
(BASELINE.json:7) while we keep it on device.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from lisec_tpu.models.common import SharedMLP, MLPHead, masked_max


class TNet(nn.Module):
    """Spatial/feature transform net predicting a KxK alignment matrix."""

    k: int

    @nn.compact
    def __call__(self, x, mask, train: bool = False):
        # x: (B, N, K)
        h = SharedMLP((64, 128, 1024))(x, train)
        g = masked_max(h, mask, axis=1)                       # (B, 1024)
        h = SharedMLP((512, 256))(g, train)
        # Initialize the output transform at identity.
        mat = nn.Dense(self.k * self.k,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros)(h)
        eye = jnp.eye(self.k, dtype=x.dtype).reshape(-1)
        return (mat + eye).reshape(-1, self.k, self.k)


class PointNetCls(nn.Module):
    num_classes: int = 40
    use_input_tnet: bool = True
    use_feature_tnet: bool = True
    dropout_rate: float = 0.4

    @nn.compact
    def __call__(self, points, point_mask, train: bool = False):
        """points: (B, N, 3); point_mask: (B, N). Returns dict with
        'logits' (B, num_classes) and 'feature_transform' (B, 64, 64)."""
        x = points
        if self.use_input_tnet:
            t_in = TNet(k=3)(x, point_mask, train)
            x = jnp.einsum("bnk,bkj->bnj", x, t_in)
        x = SharedMLP((64, 64))(x, train)
        ft = None
        if self.use_feature_tnet:
            ft = TNet(k=64)(x, point_mask, train)
            x = jnp.einsum("bnk,bkj->bnj", x, ft)
        x = SharedMLP((64, 128, 1024))(x, train)
        g = masked_max(x, point_mask, axis=1)                 # (B, 1024)
        logits = MLPHead((512, 256), self.num_classes,
                         self.dropout_rate)(g, train)
        return {"logits": logits, "feature_transform": ft}


def orthogonality_loss(transform: jnp.ndarray) -> jnp.ndarray:
    """|| I - A A^T ||_F^2 regularizer on the feature transform."""
    if transform is None:
        return jnp.array(0.0)
    k = transform.shape[-1]
    eye = jnp.eye(k, dtype=transform.dtype)
    diff = eye - jnp.einsum("bij,bkj->bik", transform, transform)
    return jnp.mean(jnp.sum(diff ** 2, axis=(1, 2)))

"""L5 — models (SURVEY.md §2.2). Importing this package registers every
model and pipeline in the registry."""

from lisec_tpu.models.pointnet import PointNetCls, TNet, orthogonality_loss
from lisec_tpu.models.common import SharedMLP, MLPHead, ConvBNRelu
import lisec_tpu.pipelines  # noqa: F401 — registration side effects

__all__ = [
    "PointNetCls", "TNet", "orthogonality_loss",
    "SharedMLP", "MLPHead", "ConvBNRelu",
]

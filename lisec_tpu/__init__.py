"""lisec-tpu: a TPU-native lidar point-cloud perception framework.

A brand-new JAX/XLA/Pallas framework with the capability surface of the
reference stack ``bot15498/Lisec`` (see SURVEY.md): point-cloud
preprocessing (voxelization/pillarization, FPS, ball-query grouping,
augmentation), five workloads (PointNet cls, PointNet++ part-seg,
PointPillars, SECOND-style sparse-conv detection, SemanticKITTI range
segmentation), fully on-device post-processing (box decode, rotated NMS),
and data-parallel training over a TPU mesh.

Public API (SURVEY.md §2.5 A1)::

    cloud  = lisec_tpu.load_cloud(path)
    batch  = lisec_tpu.preprocess(cloud, cfg)
    boxes, labels = lisec_tpu.infer(model, batch)

Design invariants (SURVEY.md §7): static shapes everywhere (budgets are
config, not code); one host<->device round-trip per cloud at inference;
kernels profiled into existence (XLA first, Pallas where the profile
shows a gap).
"""

from lisec_tpu.version import __version__
from lisec_tpu.config import (
    Config,
    load_config,
    config_from_dict,
    config_to_dict,
    apply_overrides,
)
from lisec_tpu.api import (
    load_cloud,
    preprocess,
    infer,
    build_model,
    train,
    evaluate,
)

__all__ = [
    "__version__",
    "Config",
    "load_config",
    "config_from_dict",
    "config_to_dict",
    "apply_overrides",
    "load_cloud",
    "preprocess",
    "infer",
    "build_model",
    "train",
    "evaluate",
]

"""L1 — data layer (SURVEY.md §2.1).

Loaders for the four dataset families (D1-D4), per-cloud augmentation
(D5), box/label utilities (D6), and fixed-shape collation (D7). All
host-side numpy; everything handed to the device is padded to the
config budgets so XLA sees static shapes.
"""

from lisec_tpu.data.collate import pad_points, pad_to_budget, make_batches
from lisec_tpu.data.modelnet40 import ModelNet40
from lisec_tpu.data.shapenetpart import ShapeNetPart
from lisec_tpu.data.kitti import KittiDetection, Calibration
from lisec_tpu.data.semantickitti import SemanticKitti
from lisec_tpu.data.augment import augment_cloud, augment_detection, GTSampler

__all__ = [
    "pad_points", "pad_to_budget", "make_batches",
    "ModelNet40", "ShapeNetPart", "KittiDetection", "Calibration",
    "SemanticKitti", "augment_cloud", "augment_detection", "GTSampler",
]

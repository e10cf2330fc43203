"""Workload pipelines: model + preprocessing + losses + inference for
each of the five configs (BASELINE.json:6-12). Importing this package
populates the model/pipeline registries.
"""

from lisec_tpu.pipelines.base import Pipeline, TrainState
from lisec_tpu.pipelines import classification  # noqa: F401
from lisec_tpu.pipelines import partseg  # noqa: F401
from lisec_tpu.pipelines import detection  # noqa: F401
from lisec_tpu.pipelines import rangeseg  # noqa: F401

__all__ = ["Pipeline", "TrainState"]

"""P1/P3 — mesh & sharding glue (SURVEY.md §2.4).

The reference class uses torch DDP over NCCL; on TPU there is no
user-space backend to write — XLA emits ICI collectives from the
sharding annotations. Data parallelism = a 1-D ``('data',)`` mesh with
the batch axis sharded and parameters replicated; ``jit`` then inserts
the gradient all-reduce over ICI automatically. A ``('data', 'model')``
mesh shape is kept so a model axis can be added without API changes
(SURVEY.md §2.4: TP/PP/EP do not exist in this model class).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices
    (0 = all visible)."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), ("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Device-put a host batch dict with the batch axis sharded.

    Single-process path; multi-host feeds go through
    ``jax.make_array_from_process_local_data`` with the same sharding.
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

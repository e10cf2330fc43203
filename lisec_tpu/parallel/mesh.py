"""P1/P2/P3 — mesh, launcher, and sharded-feed glue (SURVEY.md §2.4).

The reference class uses torch DDP over NCCL (`torchrun` launcher +
`DistributedSampler` feed); on TPU there is no user-space backend to
write — XLA emits ICI collectives from the sharding annotations. Data
parallelism = a 1-D ``('data',)`` mesh with the batch axis sharded and
parameters replicated; ``jit`` then inserts the gradient all-reduce
over ICI automatically (and over DCN between slices under JAX's
multi-slice runtime).

Multi-host pieces:
  * P2 launcher: :func:`initialize_distributed` wraps
    ``jax.distributed.initialize`` (auto-detecting coordinator/rank on
    TPU pods; explicit args for anything else). One process per host,
    each seeing its local chips; ``make_mesh`` then spans the GLOBAL
    device list.
  * P3 sharded feed: :func:`ProcessShardDataset` gives each host a
    strided slice of the example list (DistributedSampler-equivalent),
    and :func:`shard_batch` assembles the global batch from
    process-local data via ``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """P2 — bring up the JAX distributed runtime (multi-host).

    With no arguments, relies on TPU-pod auto-detection (the standard
    deployment); explicit coordinator/rank args cover manual launches.
    Returns True if initialization ran, False if it was skipped
    (already initialized, or a single-process run).

    When the caller passed explicit coordination args, failures other
    than "already initialized" RE-RAISE: silently degrading an
    explicitly requested multi-host launch to N independent
    single-host trainings (each computing the "global" batch with
    process_count()==1) is the worst possible failure mode.
    """
    explicit = any(v is not None for v in
                   (coordinator_address, num_processes, process_id))
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
        return True
    except (RuntimeError, ValueError) as e:
        if "already initialized" in str(e).lower():
            return False
        if explicit:
            raise
        # Auto-detect mode on a single-process environment without
        # coordination metadata — benign.
        return False


class ProcessShardDataset:
    """P3 — per-host strided shard of an indexable dataset.

    Host p of P sees examples p, p+P, p+2P, ... — every host gets the
    same length (len // P, dropping the ragged tail) so the global
    batch assembly is shape-identical across hosts every step.
    """

    def __init__(self, dataset, process_id: Optional[int] = None,
                 process_count: Optional[int] = None):
        self.dataset = dataset
        self.pid = (jax.process_index()
                    if process_id is None else process_id)
        self.pcount = (jax.process_count()
                       if process_count is None else process_count)
        self._len = len(dataset) // self.pcount

    def __len__(self) -> int:
        return self._len

    def __getitem__(self, i: int):
        return self.dataset[i * self.pcount + self.pid]


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    """1-D data-parallel mesh over the first `num_devices` devices
    (0 = all visible — across ALL processes in a multi-host run)."""
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
    """Stage a host batch dict onto the mesh, batch axis sharded.

    Single-process: one ``device_put`` per leaf. Multi-host: each
    process holds only its local slice of the global batch (see
    :class:`ProcessShardDataset`); the leaves are assembled into
    global arrays with ``jax.make_array_from_process_local_data``,
    which places each host's rows on its own chips — no cross-host
    data movement on the input path.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

"""Tracing / profiling utilities (SURVEY.md §5.1).

``trace(dir)`` wraps ``jax.profiler.trace`` (TensorBoard / Perfetto
output) around a region; ``Timer`` gives per-stage wall timings with a
device fence. On this machine the axon tunnel makes
``block_until_ready`` a no-op, so ``device_sync`` fences by reducing to
a scalar on device and pulling 4 bytes.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


def device_sync(tree) -> None:
    """Fence: force completion of all computations producing `tree`."""
    leaves = [x for x in jax.tree.leaves(tree)
              if isinstance(x, jax.Array)]
    if not leaves:
        return
    # Reduce on device; float() forces a real round trip.
    for leaf in leaves[:1]:
        float(jnp.sum(jnp.abs(leaf.ravel()[:1])))
    jax.block_until_ready(leaves)


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Profile a region: ``with trace('/tmp/profile'): step()``."""
    with jax.profiler.trace(log_dir,
                            create_perfetto_link=create_perfetto_link):
        yield


class Timer:
    """Accumulating wall-clock timer with device fencing.

        t = Timer()
        with t("voxelize"):
            out = vox_fn(points)
        print(t.summary())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, fence=None):
        t0 = time.perf_counter()
        yield
        if fence is not None:
            device_sync(fence)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, float]:
        return {k: 1e3 * v / max(self.counts[k], 1)
                for k, v in self.totals.items()}

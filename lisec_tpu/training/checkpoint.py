"""R6 — checkpoint / resume via orbax (SURVEY.md §5.4).

Async ``CheckpointManager`` storing params + batch_stats + opt_state +
step, keep-last-k, with ``--resume auto`` picking the latest valid step
(the minimum viable failure-recovery story, SURVEY.md §5.3).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, every: int = 500):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, save_interval_steps=every,
                enable_async_checkpointing=True),
        )

    def should_save(self, step: int) -> bool:
        """True iff the manager would accept a save at `step` — callers
        gate the (expensive) device->host state transfer on this."""
        return bool(self.manager.should_save(step))

    def save(self, step: int, state: Any, force: bool = False) -> bool:
        return self.manager.save(
            step, args=ocp.args.StandardSave(state), force=force)

    def restore(self, state_template: Any,
                step: Optional[int] = None) -> Any:
        if step is None:
            step = self.manager.latest_step()
        if step is None:
            return None
        # Restore to HOST numpy, then one explicit device_put per leaf.
        # On the tunneled axon backend a device->host pull from an
        # orbax-restored device buffer can deadlock (int(state.step)
        # blocked forever in jax.Array.__int__, loop.py start_step —
        # reproduced solo 2026-08-19); restoring via host makes every
        # device array a fresh ordinary transfer and keeps later host
        # pulls (start_step, weight snapshots) off the orbax buffers.
        host_template = jax.tree.map(np.asarray, state_template)
        restored = self.manager.restore(
            step, args=ocp.args.StandardRestore(host_template))
        return jax.tree.map(jnp.asarray, restored)

    def latest_step(self) -> Optional[int]:
        return self.manager.latest_step()

    def wait(self) -> None:
        self.manager.wait_until_finished()

    def close(self) -> None:
        self.manager.close()

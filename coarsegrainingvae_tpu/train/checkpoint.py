"""Full-state checkpointing with resume (orbax).

The reference only saves final model weights (`torch.save(state_dict)`,
run_ala.py:354-357) and resumes by rebuilding from modelparams.json
(postanalysis.py:74-133) -- no optimizer state, no mid-training resume.
Here a checkpoint is the COMPLETE train state (params, optimizer moments,
step counter, learning rate) plus host-side metadata (epoch, fold,
controller/early-stop counters), so a killed run restarts exactly where it
stopped.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Step-based checkpoints under `directory/<step>/` with retention."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, metadata: Optional[Dict] = None) -> None:
        """Save the device train state; metadata is a small JSON-able dict
        (epoch, fold, controller counters, ...)."""
        state = jax.device_get(state)
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        self._mgr.wait_until_finished()
        if metadata is not None:
            with open(os.path.join(self.directory, f"meta_{step}.json"), "w") as f:
                json.dump(metadata, f)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(
        self, template_state: Any, step: Optional[int] = None
    ) -> Tuple[Any, Dict, int]:
        """Restore (state, metadata, step). `template_state` provides the
        pytree structure/shapes (build it with Trainer.init_state)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, template_state)
        state = self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        meta_path = os.path.join(self.directory, f"meta_{step}.json")
        metadata: Dict = {}
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                metadata = json.load(f)
        return state, metadata, step

    def close(self) -> None:
        self._mgr.close()

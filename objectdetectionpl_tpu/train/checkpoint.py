"""Orbax checkpointing with top-k retention on val_loss + best-path persistence.

Parity with the reference's Lightning ModelCheckpoint(save_top_k=3, monitor
val_loss, mode min) (run.py:88-96) and the best-model-path txt file written
each validation epoch and re-read at startup (LightningFunc/
lightningUtils.py:17-37, run.py:83).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, save_top_k: int = 3,
                 async_save: bool = True):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=save_top_k,
            best_fn=lambda metrics: metrics["val_loss"],
            best_mode="min",
            # async: the device->host gather happens synchronously but disk
            # serialization overlaps the next epoch (epoch wall time was
            # checkpoint-bound through the tunnel); orbax blocks on the
            # in-flight save automatically if the next save starts early.
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, val_loss: float):
        self._mgr.save(step, args=ocp.args.StandardSave(state),
                       metrics={"val_loss": float(val_loss)})
        self.write_best_model_path()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        self._mgr.wait_until_finished()      # drain any in-flight async save
        step = step if step is not None else self._mgr.best_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    # --- best-path txt parity (lightningUtils.py:17-37) -----------------------

    @property
    def _best_path_file(self) -> str:
        return os.path.join(self.directory, "best_model_path.txt")

    def write_best_model_path(self):
        step = self._mgr.best_step()
        if step is not None:
            with open(self._best_path_file, "w") as f:
                f.write(os.path.join(self.directory, str(step)))

    def read_best_model_path(self) -> Optional[str]:
        if os.path.exists(self._best_path_file):
            with open(self._best_path_file) as f:
                return f.read().strip()
        return None

    def wait(self):
        """Block until any in-flight async save has committed to disk."""
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


class EarlyStopping:
    """val_loss early stop, patience 3 (run.py:98-104)."""

    def __init__(self, patience: int = 3, mode: str = "min"):
        self.patience = patience
        self.mode = mode
        self.best: Optional[float] = None
        self.bad_epochs = 0

    def update(self, metric: float) -> bool:
        """Returns True when training should stop."""
        improved = (self.best is None
                    or (metric < self.best if self.mode == "min"
                        else metric > self.best))
        if improved:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
        return self.bad_epochs >= self.patience

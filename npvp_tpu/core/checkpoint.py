"""Orbax checkpointing.

Replaces the reference's two checkpoint generations (Lightning ModelCheckpoint
+ legacy tar-with-source-snapshot, survey §5.4) with a single async Orbax
CheckpointManager: periodic saves, best-metric retention (the equivalent of
``ModelCheckpoint(monitor=..., save_top_k=...)``,
reference train_AutoEncoder_lightning.py:31-32), and restart-from-checkpoint
recovery. The resolved config is saved next to the checkpoints (replacing the
reference's source-code snapshotting, utils/train_summary.py:202-231).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str | Path, max_to_keep: int = 5,
                 save_interval_steps: int = 1,
                 monitor: Optional[str] = None, mode: str = "min"):
        """
        Args:
          directory: checkpoint root.
          max_to_keep: retention count (reference save_top_k).
          save_interval_steps: only save every N-th offered step.
          monitor: metric name for best-checkpoint retention (reference
            ``monitor='L1_loss_valid'`` / ``'loss_val'``); None = keep latest.
          mode: 'min' or 'max'.
        """
        directory = Path(directory).absolute()
        directory.mkdir(parents=True, exist_ok=True)
        kwargs = {}
        if monitor is not None:
            kwargs["best_fn"] = lambda metrics: float(metrics[monitor])
            kwargs["best_mode"] = mode
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            save_interval_steps=save_interval_steps,
            enable_async_checkpointing=True,
            **kwargs,
        )
        self._mngr = ocp.CheckpointManager(directory, options=options)
        self.directory = directory

    def save(self, step: int, state: Any,
             metrics: Optional[dict] = None) -> bool:
        """Async save; returns True if a save was started."""
        return self._mngr.save(
            step, args=ocp.args.StandardSave(state),
            metrics={k: float(v) for k, v in (metrics or {}).items()})

    def restore(self, state_template: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``state_template`` (latest step when
        ``step`` is None)."""
        if step is None:
            step = self._mngr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mngr.best_step()

    def wait(self):
        self._mngr.wait_until_finished()

    def close(self):
        self._mngr.wait_until_finished()
        self._mngr.close()

"""Checkpoint/resume via Orbax.

Replaces the reference's PyTorch-Lightning ModelCheckpoint + signal
machinery (/root/reference/main.py:840-861, :1003-1029 — `last.ckpt`,
top-k on a monitored metric, SIGUSR1 save, save-on-exception) with Orbax
over the flat TrainState pytree (params + opt state + EMA + step).

Layout: <ckpt_dir>/<step>/  (orbax native), plus a `best_steps.json`
tracking the monitored metric per kept step.
"""

from __future__ import annotations

import json
import os
import signal
from typing import Any, Callable, Optional

import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAS_ORBAX = True
except ImportError:  # pragma: no cover
    _HAS_ORBAX = False


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3,
                 monitor: Optional[str] = None, mode: str = "min"):
        if not _HAS_ORBAX:
            raise ImportError("orbax-checkpoint is required")
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        self._metrics_file = os.path.join(self.directory,
                                          "best_steps.json")

    def save(self, step: int, state: Any,
             metrics: Optional[dict] = None) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if metrics and self.monitor and self.monitor in metrics:
            data = {}
            if os.path.isfile(self._metrics_file):
                with open(self._metrics_file) as f:
                    data = json.load(f)
            data[str(step)] = float(np.asarray(metrics[self.monitor]))
            with open(self._metrics_file, "w") as f:
                json.dump(data, f)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """target: a pytree of like-shaped arrays (abstract ok)."""
        step = step if step is not None else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        return self._mgr.restore(step,
                                 args=ocp.args.StandardRestore(target))

    def best_step(self) -> Optional[int]:
        if not os.path.isfile(self._metrics_file):
            return self.latest_step()
        with open(self._metrics_file) as f:
            data = json.load(f)
        if not data:
            return self.latest_step()
        key = min if self.mode == "min" else max
        return int(key(data, key=lambda k: data[k]))

    def close(self) -> None:
        self._mgr.close()


def install_signal_checkpoint(save_fn: Callable[[], None]) -> None:
    """SIGUSR1 → checkpoint now (preemptible-cluster semantics of
    /root/reference/main.py:1003-1020)."""

    def _handler(signum, frame):
        print("SIGUSR1 received — saving checkpoint")
        save_fn()

    signal.signal(signal.SIGUSR1, _handler)

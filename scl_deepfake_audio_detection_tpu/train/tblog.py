"""Observability: tensorboard scalars + device profiler traces.

Capability match for the reference's tensorboardX usage
(``main.py:18,399,407-414``: per-epoch train/val accuracy, total loss, and a
per-loss-name detail group) and the vendored profiling trainer
(``core_scripts/nn_manager/nn_manager_profile.py:1-10``, torch.profiler →
tensorboard traces).  TPU equivalents:

- scalars: torch.utils.tensorboard when importable (the image ships torch),
  otherwise a no-op writer — the JSONL metrics file (engine.fit) is always
  written and is the source of truth;
- traces: ``jax.profiler`` xprof traces viewable in tensorboard or xprof
  (device timeline, HLO cost, HBM usage) via ``trace_epoch``.
"""

from __future__ import annotations

import contextlib
import os
from typing import Dict, Optional


class ScalarWriter:
    """Tensorboard scalar writer with a silent no-op fallback."""

    def __init__(self, logdir: Optional[str]):
        self._w = None
        if logdir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                os.makedirs(logdir, exist_ok=True)
                self._w = SummaryWriter(logdir)
            except Exception:
                self._w = None

    def scalars(self, record: Dict[str, float], step: int) -> None:
        """Write one epoch record (the engine's metrics dict).  Mirrors the
        reference layout: top-level train_*/val_* scalars plus a grouped
        per-loss detail section."""
        if self._w is None:
            return
        for k, v in record.items():
            if isinstance(v, (int, float)):
                self._w.add_scalar(k, v, step)
        detail = {
            k: v for k, v in record.items()
            if k.startswith(("train_L_", "val_L_")) and isinstance(v, (int, float))
        }
        for k, v in detail.items():
            self._w.add_scalar(f"loss_detail/{k}", v, step)

    def close(self) -> None:
        if self._w is not None:
            self._w.flush()
            self._w.close()


@contextlib.contextmanager
def trace_epoch(logdir: Optional[str]):
    """Capture a jax.profiler trace for everything inside the block
    (one training epoch, typically).  View with tensorboard's profile tab or
    xprof.  No-op when logdir is None."""
    if not logdir:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

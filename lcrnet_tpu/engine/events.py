"""Scalar event logging.

Parity target: the reference's TensorBoard `SummaryWriter` usage
(`utils/engine/base_trainer.py:60-62,249-254`).  TensorBoard isn't bundled
in this environment, so scalars are persisted as an append-only JSONL event
stream (step, tag, value, wall time) — trivially plottable and greppable;
if `tensorboardX`/`torch.utils.tensorboard` is importable the same scalars
are mirrored there.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class EventWriter:
    def __init__(self, log_dir: str, filename: str = "events.jsonl"):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, filename)
        self._fh = open(self.path, "a")
        self._tb = None
        try:  # optional TensorBoard mirror
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(log_dir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value: float, step: int):
        self._fh.write(
            json.dumps({"step": int(step), "tag": tag, "value": float(value), "time": time.time()})
            + "\n"
        )
        self._fh.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_scalars(self, scalars: Dict[str, float], step: int, prefix: str = ""):
        for k, v in scalars.items():
            try:
                self.add_scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self):
        self._fh.close()
        if self._tb is not None:
            self._tb.close()

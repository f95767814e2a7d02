"""Metric meters and timers.

Parity target: `utils/utils/summary_board.py:7-97`, `average_meter.py:4-35`,
`timer.py:4-79`.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np


class AverageMeter:
    def __init__(self, window: Optional[int] = None):
        self.window = window
        self.records = []

    def update(self, value):
        self.records.append(float(value))
        if self.window is not None and len(self.records) > self.window:
            self.records.pop(0)

    def reset(self):
        self.records = []

    @property
    def count(self):
        return len(self.records)

    def sum(self):
        return float(np.sum(self.records)) if self.records else 0.0

    def mean(self):
        return float(np.mean(self.records)) if self.records else 0.0

    def std(self):
        return float(np.std(self.records)) if self.records else 0.0

    def median(self):
        return float(np.median(self.records)) if self.records else 0.0


class SummaryBoard:
    """Named meter registry with adaptive registration."""

    def __init__(self, window: Optional[int] = None, adaptive: bool = True):
        self.window = window
        self.adaptive = adaptive
        self.meters: Dict[str, AverageMeter] = {}

    def register(self, name: str):
        self.meters[name] = AverageMeter(self.window)

    def update(self, name: str, value):
        if name not in self.meters:
            if not self.adaptive:
                raise KeyError(name)
            self.register(name)
        self.meters[name].update(value)

    def update_from_dict(self, d: Dict):
        for k, v in d.items():
            try:
                self.update(k, float(v))
            except (TypeError, ValueError):
                pass

    def summary(self) -> Dict[str, float]:
        return {k: m.mean() for k, m in self.meters.items()}

    def reset(self):
        for m in self.meters.values():
            m.reset()

    def format(self) -> str:
        return ", ".join(f"{k}: {m.mean():.4f}" for k, m in self.meters.items())


class Timer:
    """Prepare/process wall-time accumulator (reference `timer.py:4-79`)."""

    def __init__(self):
        self.total_prepare = 0.0
        self.total_process = 0.0
        self.count_prepare = 0
        self.count_process = 0
        self._last = time.perf_counter()

    def reset(self):
        self.__init__()

    def tic(self):
        self._last = time.perf_counter()

    def toc_prepare(self):
        now = time.perf_counter()
        self.total_prepare += now - self._last
        self.count_prepare += 1
        self._last = now

    def toc_process(self):
        now = time.perf_counter()
        self.total_process += now - self._last
        self.count_process += 1
        self._last = now

    @property
    def mean_prepare(self):
        return self.total_prepare / max(self.count_prepare, 1)

    @property
    def mean_process(self):
        return self.total_process / max(self.count_process, 1)

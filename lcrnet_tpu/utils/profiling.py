"""Tracing / profiling / debugging utilities.

The reference's observability is manual wall-clock timers and commented
time.time() probes (SURVEY.md §5).  Here:
  * `trace()` wraps a region in a jax.profiler trace (viewable in
    TensorBoard / Perfetto)
  * `StepTimer` gives structured per-step timings with device sync
  * `check_finite_tree` is the NaN/Inf gradient sweep
    (reference `base_trainer.py:224-232`) as a jittable reduction
  * `nan_debug()` enables jax_debug_nans (the analogue of
    torch.autograd.set_detect_anomaly, `epoch_based_trainer.py:101`)
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region: with trace('/tmp/tb'): step(...)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_debug(enable: bool = True):
    """Raise on NaN production inside jitted code (debug builds only —
    disables some fusions)."""
    if enable:
        with jax.debug_nans(True):
            yield
    else:
        yield


def check_finite_tree(tree) -> jnp.ndarray:
    """True iff every leaf is finite (jittable; psum-safe)."""
    leaves = jax.tree.leaves(tree)
    oks = [jnp.all(jnp.isfinite(leaf)) for leaf in leaves if hasattr(leaf, "dtype")]
    out = jnp.asarray(True)
    for ok in oks:
        out = jnp.logical_and(out, ok)
    return out


class StepTimer:
    """Synchronized step timing with named phases."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}
        self._start: Optional[float] = None
        self._phase: Optional[str] = None

    def start(self, phase: str):
        self._phase = phase
        self._start = time.perf_counter()

    def stop(self, sync_on=None):
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._start
        self.totals[self._phase] = self.totals.get(self._phase, 0.0) + dt
        self.counts[self._phase] = self.counts.get(self._phase, 0) + 1
        return dt

    def means(self) -> Dict[str, float]:
        return {k: self.totals[k] / max(self.counts[k], 1) for k in self.totals}

    def format(self) -> str:
        return ", ".join(f"{k}: {v * 1e3:.1f} ms" for k, v in self.means().items())

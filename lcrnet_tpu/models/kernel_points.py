"""Deterministic kernel-point dispositions for KPConv.

Capability parity with `experiments/lcrnet/modules/kpconv/kernel_points.py`
(load_kernels + repulsion optimization), with one deliberate inversion: the
reference applies a *random* rotation and noise to the dispositions at every
model build (`kernel_points.py:428-452`), which breaks bit-reproducibility
between runs.  Here the dispositions are generated once by a seeded repulsion
optimization and cached — every model build sees identical kernel geometry.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np


@lru_cache(maxsize=None)
def _unit_dispositions(num_points: int, seed: int = 7351, ratio: float = 0.66) -> np.ndarray:
    """K points in the unit ball: one pinned at the origin, the rest spread by
    electrostatic repulsion + weak central attraction, then rescaled so the
    mean radius of the ring points equals ``ratio`` (KPConv convention)."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-1, 1, size=(num_points, 3))
    pts[0] = 0.0
    lr = 0.01
    for _ in range(2000):
        diff = pts[:, None, :] - pts[None, :, :]          # (K, K, 3)
        d2 = (diff ** 2).sum(-1) + 1e-12
        np.fill_diagonal(d2, np.inf)
        rep = (diff / (d2 ** 1.5)[..., None]).sum(axis=1)  # inverse-square push
        grad = rep - pts                                   # central pull
        grad[0] = 0.0
        norm = np.linalg.norm(grad, axis=1, keepdims=True)
        pts = pts + lr * grad / np.maximum(norm, 1e-9)
        # clip to unit ball
        r = np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-9)
        pts = np.where(r > 1.0, pts / r, pts)
    r = np.linalg.norm(pts[1:], axis=1)
    pts[1:] *= ratio / r.mean()
    return pts.astype(np.float32)


def load_kernel_points(radius: float, num_points: int = 15) -> np.ndarray:
    """Kernel point positions (K, 3) scaled to the conv radius."""
    return _unit_dispositions(num_points) * np.float32(radius)

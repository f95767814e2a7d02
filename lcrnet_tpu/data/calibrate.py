"""Neighbor-limit calibration.

Parity target: `experiments/lcrnet/data.py:408-433`
(`calibrate_neighbors_stack_mode`): histogram in-radius neighbor counts over
sample clouds until > `sample_threshold` samples per stage, then pick the
limit covering `keep_ratio` of the cumulative mass (80% quantile).

In the TPU build the limits are *static compile-time shape budgets*
(`ShapeBudget.neighbor_limits`), so calibration is an offline utility that
suggests values; counting runs on device via the uncapped radius counts.
"""

from __future__ import annotations

from typing import Callable, List, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from lcrnet_tpu.config import LCRNetConfig
from lcrnet_tpu.data.kitti import pad_points
from lcrnet_tpu.ops.grid_subsample import grid_subsample
from lcrnet_tpu.ops.pairwise_distance import pairwise_distance


def _count_in_radius(points, mask, radius, block=2048):
    """Per-point in-radius neighbor counts (no cap)."""
    n = points.shape[0]
    pad = (-n) % block
    qp = jnp.pad(points, ((0, pad), (0, 0))).reshape(-1, block, 3)

    def one(b):
        d2 = pairwise_distance(b, points)
        ok = jnp.logical_and(d2 <= radius * radius, mask[None, :])
        return jnp.sum(ok.astype(jnp.int32), axis=1)

    counts = jax.lax.map(one, qp).reshape(-1)[:n]
    return jnp.where(mask, counts, 0)


def calibrate_neighbor_limits(
    cfg: LCRNetConfig,
    scan_source: Callable[[int], np.ndarray],
    sample_indices: Sequence[int],
    keep_ratio: float = 0.8,
    sample_threshold: int = 2000,
) -> List[int]:
    """Suggest per-stage neighbor limits from data (reference semantics:
    per-stage quantile of the in-radius count histogram)."""
    num_stages = cfg.backbone.num_stages
    caps = cfg.shapes.points
    counts_per_stage: List[List[int]] = [[] for _ in range(num_stages)]

    @jax.jit
    def stage_counts(points, mask):
        out = []
        pts, msk = points, mask
        voxel = cfg.backbone.init_voxel_size * 2.0
        radius = cfg.backbone.init_radius
        for s in range(num_stages):
            if s > 0:
                pts, msk = grid_subsample(pts, msk, voxel, caps[s])
                voxel *= 2.0
            out.append((_count_in_radius(pts, msk, radius), msk))
            radius *= 2.0
        return out

    for idx in sample_indices:
        pts, msk = pad_points(scan_source(idx), caps[0])
        results = stage_counts(jnp.asarray(pts), jnp.asarray(msk))
        for s, (cnt, m) in enumerate(results):
            counts_per_stage[s].extend(np.asarray(cnt)[np.asarray(m)].tolist())
        if min(len(c) for c in counts_per_stage) > sample_threshold:
            break

    limits = []
    for s in range(num_stages):
        arr = np.sort(np.asarray(counts_per_stage[s]))
        limits.append(int(arr[min(int(keep_ratio * len(arr)), len(arr) - 1)]))
    return limits

"""On-device multi-scale pyramid construction.

Parity target: `experiments/lcrnet/data.py:10-74`
(`precompute_data_stack_mode`): per stage, grid-subsample at doubling voxel
size, then compute three neighbor tables — self neighbors, subsampling
(coarse queries over fine supports) and upsampling (fine queries over coarse
supports at 2x radius).

The reference runs this in CPU DataLoader worker processes with nanoflann;
here the whole pyramid is built inside the jitted step on device (the core
architectural inversion of the TPU build — SURVEY.md §7).  One cloud per
call; vmap over the cloud axis for pairs/batches.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from lcrnet_tpu.ops.grid_subsample import grid_subsample
from lcrnet_tpu.ops.radius_search import radius_search


class Pyramid(NamedTuple):
    """Static-shape pyramid for one cloud (tuple fields are per stage)."""

    points: Tuple[jnp.ndarray, ...]        # (N_s, 3) per stage
    masks: Tuple[jnp.ndarray, ...]         # (N_s,) bool per stage
    neighbors: Tuple[jnp.ndarray, ...]     # (N_s, L_s) self neighbor tables
    neighbor_masks: Tuple[jnp.ndarray, ...]
    subsampling: Tuple[jnp.ndarray, ...]   # (N_{s+1}, L_s) coarse<-fine pooling
    subsampling_masks: Tuple[jnp.ndarray, ...]
    upsampling: Tuple[jnp.ndarray, ...]    # (N_s, L_up) fine<-coarse unpooling
    upsampling_masks: Tuple[jnp.ndarray, ...]


def build_pyramid(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    stage_capacities: Sequence[int],
    neighbor_limits: Sequence[int],
    init_voxel_size: float,
    init_radius: float,
    upsample_limit: int = 4,
) -> Pyramid:
    """Build the full pyramid for one padded cloud.

    Args:
      points: (N0, 3) stage-0 points (already voxelized at init_voxel_size by
        data prep, matching the reference's offline 0.3 m downsample).
      mask: (N0,) validity.
      stage_capacities: static per-stage point budgets (len = num_stages).
      neighbor_limits: static per-stage neighbor-table widths.
      init_voxel_size / init_radius: stage-0 voxel and search radius; both
        double per stage (reference `data.py:20-66`).
      upsample_limit: width of the upsampling tables (the reference stores
        the full neighbor limit but consumers only read the first column /
        first k — `modules/kpconv/functional.py:6-55`).
    """
    num_stages = len(stage_capacities)
    assert len(neighbor_limits) == num_stages

    pts = [points]
    msks = [mask]
    voxel = init_voxel_size * 2.0
    for i in range(1, num_stages):
        p, m = grid_subsample(pts[-1], msks[-1], voxel, stage_capacities[i])
        pts.append(p)
        msks.append(m)
        voxel *= 2.0

    neighbors, neighbor_masks = [], []
    subsampling, subsampling_masks = [], []
    upsampling, upsampling_masks = [], []
    radius = init_radius
    for i in range(num_stages):
        idx, val = radius_search(pts[i], pts[i], msks[i], msks[i], radius, neighbor_limits[i])
        neighbors.append(idx)
        neighbor_masks.append(val)
        if i < num_stages - 1:
            idx, val = radius_search(
                pts[i + 1], pts[i], msks[i + 1], msks[i], radius, neighbor_limits[i]
            )
            subsampling.append(idx)
            subsampling_masks.append(val)
            idx, val = radius_search(
                pts[i], pts[i + 1], msks[i], msks[i + 1], radius * 2.0, upsample_limit
            )
            upsampling.append(idx)
            upsampling_masks.append(val)
        radius *= 2.0

    return Pyramid(
        points=tuple(pts),
        masks=tuple(msks),
        neighbors=tuple(neighbors),
        neighbor_masks=tuple(neighbor_masks),
        subsampling=tuple(subsampling),
        subsampling_masks=tuple(subsampling_masks),
        upsampling=tuple(upsampling),
        upsampling_masks=tuple(upsampling_masks),
    )


def build_pair_pyramids(
    ref_points: jnp.ndarray,
    ref_mask: jnp.ndarray,
    src_points: jnp.ndarray,
    src_mask: jnp.ndarray,
    **kwargs,
) -> Tuple[Pyramid, Pyramid]:
    """Pyramids for a (ref, src) pair via vmap over the cloud axis."""
    stacked = jax.vmap(lambda p, m: build_pyramid(p, m, **kwargs))(
        jnp.stack([ref_points, src_points]), jnp.stack([ref_mask, src_mask])
    )
    ref = jax.tree.map(lambda x: x[0], stacked)
    src = jax.tree.map(lambda x: x[1], stacked)
    return ref, src

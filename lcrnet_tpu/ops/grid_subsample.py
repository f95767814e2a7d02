"""On-device voxel-grid subsampling.

Capability parity with the reference's C++ CPU extension
(`utils/extensions/cpu/grid_subsampling/grid_subsampling_cpu.cpp:3-75`): hash
each point to a voxel id ``iX + nX*iY + nX*nY*iZ`` relative to the floored min
corner, then average all points in each voxel (barycenter, not centroid-snap).

TPU-native design: instead of an unordered_map on the host inside DataLoader
workers, we sort points by voxel id on device and segment-mean them — a
sort + cumsum + segment_sum pipeline with fully static shapes.  Output voxels
are ordered by voxel id (the reference's hash-map order is unspecified; all
downstream consumers are permutation-invariant per cloud).

Input/output convention: dense padded (N, 3) points + (N,) bool mask.
Padded outputs get coordinate PAD_COORD so distance-based consumers exclude
them naturally.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

PAD_COORD = 1.0e6
_INVALID_ID = jnp.iinfo(jnp.int32).max


def voxel_ids(points: jnp.ndarray, mask: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """Flattened voxel id per point (int32); invalid points get _INVALID_ID."""
    big = jnp.where(mask[:, None], points, jnp.inf)
    small = jnp.where(mask[:, None], points, -jnp.inf)
    min_corner = jnp.min(big, axis=0)
    max_corner = jnp.max(small, axis=0)
    origin = jnp.floor(min_corner / voxel_size) * voxel_size
    n_cells = (jnp.floor((max_corner - origin) / voxel_size) + 1.0).astype(jnp.int32)
    ijk = jnp.floor((points - origin) / voxel_size).astype(jnp.int32)
    ids = ijk[:, 0] + n_cells[0] * ijk[:, 1] + n_cells[0] * n_cells[1] * ijk[:, 2]
    return jnp.where(mask, ids, _INVALID_ID)


def grid_subsample(
    points: jnp.ndarray,
    mask: jnp.ndarray,
    voxel_size: float,
    out_capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Voxel-average a single padded cloud.

    Args:
      points: (N, 3) float32, padded rows arbitrary.
      mask: (N,) bool validity.
      voxel_size: voxel edge length.
      out_capacity: static output size M (voxels beyond capacity are dropped,
        in voxel-id order — with sanely chosen budgets this never triggers).

    Returns:
      (out_points (M, 3), out_mask (M,)) — barycenters per occupied voxel.
    """
    n = points.shape[0]
    ids = voxel_ids(points, mask, voxel_size)
    order = jnp.argsort(ids)  # invalid ids (INT32_MAX) sort to the tail
    sorted_ids = ids[order]
    sorted_points = points[order]
    sorted_valid = sorted_ids != _INVALID_ID

    is_new = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_ids[1:] != sorted_ids[:-1]]
    )
    is_new = jnp.logical_and(is_new, sorted_valid)
    seg = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # voxel slot per point
    seg = jnp.where(sorted_valid, seg, out_capacity)  # drop invalid rows

    num_voxels = jnp.sum(is_new.astype(jnp.int32))

    sums = jax.ops.segment_sum(
        jnp.where(sorted_valid[:, None], sorted_points, 0.0),
        seg,
        num_segments=out_capacity,
        indices_are_sorted=True,
    )
    counts = jax.ops.segment_sum(
        sorted_valid.astype(jnp.float32), seg, num_segments=out_capacity,
        indices_are_sorted=True,
    )
    out_mask = jnp.arange(out_capacity) < jnp.minimum(num_voxels, out_capacity)
    out_points = sums / jnp.maximum(counts, 1.0)[:, None]
    out_points = jnp.where(out_mask[:, None], out_points, PAD_COORD)
    return out_points, out_mask

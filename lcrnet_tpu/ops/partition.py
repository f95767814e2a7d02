"""Point-to-node partition and kNN partition.

Parity target: `experiments/lcrnet/modules/ops/pointcloud_partition.py:9-175`
(the "fixed knn bug" variant: each fine point is assigned to its nearest
node; a node's patch only contains points assigned to it, capped at
``point_limit`` nearest, sentinel-padded).

TPU design: one (M, N) distance matrix (M nodes <= a few hundred), scatter-max
for node occupancy, masked top-k for the patch tables.  All static shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from lcrnet_tpu.ops.pairwise_distance import pairwise_distance

_BIG = 1.0e12


def point_to_node_partition(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    point_mask: jnp.ndarray,
    node_mask: jnp.ndarray,
    point_limit: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Partition points to their nearest node.

    Args:
      points: (N, 3) fine points (+ mask); nodes: (M, 3) coarse nodes (+ mask).
      point_limit: static patch capacity K.

    Returns:
      point_to_node (N,) int32: nearest node per point (invalid points get M)
      node_occupied (M,) bool: node has >= 1 assigned point
      node_knn_indices (M, K) int32 in [0, N] (sentinel N on padding)
      node_knn_masks (M, K) bool
    """
    n, m = points.shape[0], nodes.shape[0]
    sq = pairwise_distance(nodes, points)  # (M, N)
    sq = jnp.where(node_mask[:, None], sq, _BIG)
    sq = jnp.where(point_mask[None, :], sq, _BIG)

    point_to_node = jnp.argmin(sq, axis=0).astype(jnp.int32)  # (N,)
    point_to_node = jnp.where(point_mask, point_to_node, m)

    node_occupied = (
        jnp.zeros((m + 1,), jnp.int32).at[point_to_node].max(point_mask.astype(jnp.int32))[:m]
        > 0
    )

    # patch extraction WITHOUT a per-node top-k: a (M, N) masked top_k
    # lowers to a full stable sort of every node's N-wide row (11 ms/pair on
    # TPU at 256x20480).  Instead order the N points once by
    # (assigned node, distance) — two stable (N,) argsorts — after which
    # each node's patch is a contiguous run: run starts come from a
    # vectorized binary search and the table is a small (M, K) gather.
    # Identical semantics: distance-ascending within the patch, ties by
    # original point index (top_k's tie rule), capped at K nearest.
    d_assigned = jnp.min(sq, axis=0)  # distance to the assigned node
    # points with no reachable valid node (all-BIG column) must not enter
    # any patch — route them to the sentinel segment m
    p2n_eff = jnp.where(d_assigned < _BIG / 2, point_to_node, m)
    ord_d = jnp.argsort(jnp.where(point_mask, d_assigned, _BIG), stable=True)
    ord_n = jnp.argsort(p2n_eff[ord_d], stable=True)
    order = ord_d[ord_n].astype(jnp.int32)  # grouped by node, nearest-first
    sorted_p2n = p2n_eff[order]

    starts = jnp.searchsorted(sorted_p2n, jnp.arange(m + 1, dtype=jnp.int32), side="left")
    counts = starts[1:] - starts[:m]  # (M,)
    pos = starts[:m, None] + jnp.arange(point_limit, dtype=jnp.int32)[None, :]
    knn_masks = jnp.arange(point_limit, dtype=jnp.int32)[None, :] < counts[:, None]
    knn_idx = order[jnp.clip(pos, 0, n - 1)]
    knn_idx = jnp.where(knn_masks, knn_idx, n)
    return point_to_node, node_occupied, knn_idx, knn_masks


def ball_query_partition(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    point_mask: jnp.ndarray,
    node_mask: jnp.ndarray,
    radius: float,
    point_limit: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """kNN capped by a radius (reference `pointcloud_partition.py:158-175`):
    the up-to-`point_limit` nearest points within `radius` of each node.

    Returns (indices (M, K) with sentinel N, masks (M, K), sizes (M,))."""
    n = points.shape[0]
    d2, idx, masks = knn_partition(points, nodes, point_mask, node_mask, point_limit)
    masks = jnp.logical_and(masks, d2 < radius * radius)
    idx = jnp.where(masks, idx, n)
    return idx, masks, jnp.sum(masks.astype(jnp.int32), axis=1)


def random_grouping(
    points: jnp.ndarray,
    point_mask: jnp.ndarray,
    num_groups: int,
    group_size: int,
    key,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Random-sample grouping (capability parity with the vestigial CUDA
    `cpp_wrappers/grouping/lib/src/grouping_gpu.cu`): pick `num_groups`
    random valid seeds and `group_size` random valid members per group.

    Returns (group_indices (G, S) int32, valid (G, S))."""
    import jax

    n = points.shape[0]
    logits = jnp.where(point_mask, 0.0, -1.0e9)
    k1, k2 = jax.random.split(key)
    seeds = jax.random.categorical(k1, logits, shape=(num_groups,))
    members = jax.random.categorical(k2, logits, shape=(num_groups, group_size - 1))
    groups = jnp.concatenate([seeds[:, None], members], axis=1).astype(jnp.int32)
    valid = point_mask[groups]
    any_valid = jnp.any(point_mask)
    return groups, jnp.logical_and(valid, any_valid)


def knn_partition(
    points: jnp.ndarray,
    nodes: jnp.ndarray,
    point_mask: jnp.ndarray,
    node_mask: jnp.ndarray,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k nearest points per node (reference `pointcloud_partition.py:36-58`).

    Returns (knn_sq_distances, knn_indices, knn_masks), nearest-first.
    """
    sq = pairwise_distance(nodes, points)
    sq = jnp.where(point_mask[None, :], sq, _BIG)
    neg, idx = lax.top_k(-sq, k)
    masks = jnp.logical_and(neg > -_BIG / 2, node_mask[:, None])
    return -neg, idx.astype(jnp.int32), masks

"""On-device radius neighbor search with fixed neighbor limit.

Capability parity with the reference's nanoflann-based C++ extension
(`utils/extensions/cpu/radius_neighbors/radius_neighbors_cpu.cpp:3-91` +
`modules/ops/radius_search.py:7-27`): for each query point, the indices of
support points within ``radius``, sorted by distance ascending, truncated to
``limit`` columns, padded with a sentinel.

TPU-native design: the KD-tree + per-sample host process pool becomes a
blocked brute-force distance + top-k sweep that runs inside the jitted step.
The (Q, S) distance matrix is never materialized — queries are processed in
blocks via lax.map, each block doing one MXU matmul against all supports and
a VPU top-k.  For KITTI-scale clouds (<= 20k support points) this is
bandwidth-trivial and removes the reference's biggest architectural sin: CPU
radius searches inside the forward pass (`backbone4.py:149-206`).

Convention: returns (indices (Q, limit) int32, valid (Q, limit) bool).
Indices of invalid slots are clamped to S (one-past-end sentinel, matching
the reference) — gather-side code should use the mask, not the sentinel.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from lcrnet_tpu.ops.pairwise_distance import pairwise_distance

_BIG = 1.0e12


def radius_search(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_mask: jnp.ndarray,
    s_mask: jnp.ndarray,
    radius: float,
    limit: int,
    block_size: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-width radius neighbors of q_points among s_points.

    Args:
      q_points: (Q, 3); s_points: (S, 3); masks: validity per row.
      radius: search radius.
      limit: static neighbor-table width (nearest-first truncation — same
        semantics as the reference's neighbor-limit column truncation).
      block_size: query rows per map step (memory knob).

    Returns:
      indices (Q, limit) int32 in [0, S], valid (Q, limit) bool.
    """
    q, s = q_points.shape[0], s_points.shape[0]
    r2 = radius * radius
    s_invalid = jnp.logical_not(s_mask)

    pad = (-q) % block_size
    qp = jnp.pad(q_points, ((0, pad), (0, 0)))
    num_blocks = qp.shape[0] // block_size
    qp = qp.reshape(num_blocks, block_size, 3)

    def one_block(block):
        d2 = pairwise_distance(block, s_points)  # (B, S)
        d2 = jnp.where(s_invalid[None, :], _BIG, d2)
        d2 = jnp.where(d2 <= r2, d2, _BIG)
        neg, idx = lax.top_k(-d2, limit)
        return idx.astype(jnp.int32), neg > -_BIG / 2

    idx, valid = lax.map(one_block, qp)
    idx = idx.reshape(-1, limit)[:q]
    valid = valid.reshape(-1, limit)[:q]
    valid = jnp.logical_and(valid, q_mask[:, None])
    idx = jnp.where(valid, idx, s)
    return idx, valid


def radius_search_batched(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_mask: jnp.ndarray,
    s_mask: jnp.ndarray,
    radius: float,
    limit: int,
    block_size: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched radius search over (B, Q, 3) queries and (B, S, 3) supports.

    All clouds' query blocks are flattened into ONE lax.map with the per-block
    support selected by dynamic index — vmapping the single-cloud search over
    the cloud axis compiles to a ~4x slower program on TPU.
    """
    b, q, _ = q_points.shape
    s = s_points.shape[1]
    r2 = radius * radius

    block = min(block_size, q)
    pad = (-q) % block
    nb = (q + pad) // block
    qp = jnp.pad(q_points, ((0, 0), (0, pad), (0, 0))).reshape(b * nb, block, 3)
    cloud_of_block = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nb)
    s_invalid = jnp.logical_not(s_mask)

    def one_block(args):
        blk, cid = args
        sup = lax.dynamic_index_in_dim(s_points, cid, axis=0, keepdims=False)
        inv = lax.dynamic_index_in_dim(s_invalid, cid, axis=0, keepdims=False)
        d2 = pairwise_distance(blk, sup)
        d2 = jnp.where(inv[None, :], _BIG, d2)
        d2 = jnp.where(d2 <= r2, d2, _BIG)
        neg, idx = lax.top_k(-d2, limit)
        return idx.astype(jnp.int32), neg > -_BIG / 2

    idx, valid = lax.map(one_block, (qp, cloud_of_block))
    idx = idx.reshape(b, nb * block, limit)[:, :q]
    valid = valid.reshape(b, nb * block, limit)[:, :q]
    valid = jnp.logical_and(valid, q_mask[..., None])
    idx = jnp.where(valid, idx, s)
    return idx, valid


def nearest_search_batched(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_mask: jnp.ndarray,
    s_mask: jnp.ndarray,
    radius: float,
    block_size: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest in-radius support per query, batched: (B, Q) indices + valid.

    Single argmin reduction per block — no sort.  This serves the upsampling
    tables, whose only consumer reads the nearest entry
    (`modules/kpconv/functional.py:6-23` nearest_upsample).
    """
    b, q, _ = q_points.shape
    s = s_points.shape[1]
    r2 = radius * radius

    block = min(block_size, q)
    pad = (-q) % block
    nb = (q + pad) // block
    qp = jnp.pad(q_points, ((0, 0), (0, pad), (0, 0))).reshape(b * nb, block, 3)
    cloud_of_block = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nb)
    s_invalid = jnp.logical_not(s_mask)

    def one_block(args):
        blk, cid = args
        sup = lax.dynamic_index_in_dim(s_points, cid, axis=0, keepdims=False)
        inv = lax.dynamic_index_in_dim(s_invalid, cid, axis=0, keepdims=False)
        d2 = pairwise_distance(blk, sup)
        d2 = jnp.where(inv[None, :], _BIG, d2)
        idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
        best = jnp.min(d2, axis=1)
        return idx, best <= r2

    idx, valid = lax.map(one_block, (qp, cloud_of_block))
    idx = idx.reshape(b, nb * block)[:, :q]
    valid = valid.reshape(b, nb * block)[:, :q]
    valid = jnp.logical_and(valid, q_mask)
    idx = jnp.where(valid, idx, s)
    return idx, valid


def knn_search(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    q_mask: jnp.ndarray,
    s_mask: jnp.ndarray,
    k: int,
    block_size: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k nearest supports per query (no radius cut). Returns (d2, idx, valid)."""
    q = q_points.shape[0]
    s_invalid = jnp.logical_not(s_mask)

    pad = (-q) % block_size
    qp = jnp.pad(q_points, ((0, pad), (0, 0)))
    num_blocks = qp.shape[0] // block_size
    qp = qp.reshape(num_blocks, block_size, 3)

    def one_block(block):
        d2 = pairwise_distance(block, s_points)
        d2 = jnp.where(s_invalid[None, :], _BIG, d2)
        neg, idx = lax.top_k(-d2, k)
        return -neg, idx.astype(jnp.int32), neg > -_BIG / 2

    d2, idx, valid = lax.map(one_block, qp)
    d2 = d2.reshape(-1, k)[:q]
    idx = idx.reshape(-1, k)[:q]
    valid = jnp.logical_and(valid.reshape(-1, k)[:q], q_mask[:, None])
    return d2, idx, valid

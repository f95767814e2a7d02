"""Chamfer and Earth Mover's distances, masked and on-device.

Capability parity with the reference's vendored CUDA kernels
(`cpp_wrappers/chamfer_dist/chamfer.cu`, `modules/ChamferDistancePytorch/*`,
`cpp_wrappers/emd/cuda/emd_kernel.cu` — SURVEY.md §2.1; all unused by the
shipped pipeline but part of the capability surface) and the pure-torch
`modified_chamfer_distance` (`modules/registration/metrics.py:8-44`).

Chamfer is a masked min over the pairwise distance matrix; EMD uses the
auction algorithm as a fixed-iteration lax.scan (approximate, like the
reference's CUDA auction kernel).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import lax

from lcrnet_tpu.ops.masked import masked_mean
from lcrnet_tpu.ops.pairwise_distance import pairwise_distance
from lcrnet_tpu.ops.transform import apply_transform

_BIG = 1.0e12


def chamfer_distance(
    x: jnp.ndarray,
    y: jnp.ndarray,
    x_mask: Optional[jnp.ndarray] = None,
    y_mask: Optional[jnp.ndarray] = None,
    squared: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-sided chamfer: per-point min distances (dist_x (N,), dist_y (M,)).

    Matches the CUDA kernels' squared-distance convention by default.
    """
    if x_mask is None:
        x_mask = jnp.ones(x.shape[:-1], jnp.bool_)
    if y_mask is None:
        y_mask = jnp.ones(y.shape[:-1], jnp.bool_)
    d2 = pairwise_distance(x, y)
    d2 = jnp.where(y_mask[..., None, :], d2, _BIG)
    d2 = jnp.where(x_mask[..., :, None], d2, _BIG)
    dx = jnp.min(d2, axis=-1)
    dy = jnp.min(d2, axis=-2)
    if not squared:
        dx, dy = jnp.sqrt(dx), jnp.sqrt(dy)
    dx = jnp.where(x_mask, dx, 0.0)
    dy = jnp.where(y_mask, dy, 0.0)
    return dx, dy


def chamfer_loss(x, y, x_mask=None, y_mask=None) -> jnp.ndarray:
    """Mean two-sided chamfer (squared)."""
    dx, dy = chamfer_distance(x, y, x_mask, y_mask)
    if x_mask is None:
        x_mask = jnp.ones(x.shape[:-1], jnp.bool_)
    if y_mask is None:
        y_mask = jnp.ones(y.shape[:-1], jnp.bool_)
    return masked_mean(dx, x_mask) + masked_mean(dy, y_mask)


def modified_chamfer_distance(
    raw_points: jnp.ndarray,
    ref_points: jnp.ndarray,
    src_points: jnp.ndarray,
    gt_transform: jnp.ndarray,
    transform: jnp.ndarray,
    raw_mask: Optional[jnp.ndarray] = None,
    ref_mask: Optional[jnp.ndarray] = None,
    src_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Modified chamfer (reference `modules/registration/metrics.py:8-44`):
    mean sqrt-distance of (est-aligned src -> raw) plus (ref ->
    raw aligned by est o gt^-1)."""
    from lcrnet_tpu.ops.transform import inverse_transform

    aligned_src = apply_transform(src_points, transform)
    d_fwd, _ = chamfer_distance(aligned_src, raw_points, src_mask, raw_mask)
    composed = jnp.matmul(
        transform, inverse_transform(gt_transform), precision=lax.Precision.HIGHEST
    )
    aligned_raw = apply_transform(raw_points, composed)
    d_bwd, _ = chamfer_distance(ref_points, aligned_raw, ref_mask, raw_mask)
    if src_mask is None:
        src_mask = jnp.ones(src_points.shape[:-1], jnp.bool_)
    if ref_mask is None:
        ref_mask = jnp.ones(ref_points.shape[:-1], jnp.bool_)
    return masked_mean(jnp.sqrt(d_fwd), src_mask) + masked_mean(jnp.sqrt(d_bwd), ref_mask)


def emd_auction(
    x: jnp.ndarray,
    y: jnp.ndarray,
    iterations: int = 50,
    epsilon: float = 0.01,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Approximate Earth Mover's Distance via the auction algorithm
    (capability parity with `cpp_wrappers/emd/cuda/emd_kernel.cu`).

    Args: x (N, 3) bidders, y (N, 3) items (equal sizes, like the CUDA op).
    Returns (assignment (N,) int32: item per bidder, mean_matched_distance).
    """
    n = x.shape[0]
    d2 = pairwise_distance(x, y)  # cost (N, N)
    value = -d2  # bidders maximize value

    def round_fn(carry, _):
        prices, owner = carry  # (N,), (N,) owner[item] = bidder or -1
        # unassigned bidders bid for their best item
        assigned_item = jnp.full((n,), -1, jnp.int32)
        assigned_item = assigned_item.at[owner].set(
            jnp.arange(n, dtype=jnp.int32), mode="drop"
        )
        # benefit per bidder/item
        net = value - prices[None, :]
        best = jnp.argmax(net, axis=1)
        best_v = jnp.max(net, axis=1)
        second_v = jnp.sort(net, axis=1)[:, -2]
        bid = best_v - second_v + epsilon

        is_unassigned = jnp.full((n,), True)
        is_unassigned = is_unassigned.at[owner].set(False, mode="drop")
        # highest bid per item wins (scatter-max with bidder tiebreak)
        bid_amount = jnp.where(is_unassigned, bid, -_BIG)
        item_best_bid = jnp.full((n,), -_BIG).at[best].max(bid_amount)
        won = jnp.logical_and(
            is_unassigned, bid_amount >= item_best_bid[best] - 1e-12
        )
        # resolve ties: lowest bidder index wins
        bidder_rank = jnp.where(won, jnp.arange(n), n)
        item_winner = jnp.full((n,), n, jnp.int32).at[best].min(
            bidder_rank.astype(jnp.int32)
        )
        actually_won = item_winner[best] == jnp.arange(n)
        new_prices = prices.at[best].add(
            jnp.where(actually_won, bid_amount, 0.0), mode="drop"
        )
        # previous owner of a re-won item is evicted
        evict = jnp.zeros((n,), jnp.bool_).at[best].max(actually_won)
        new_owner = jnp.where(evict, -1, owner)
        winners = jnp.where(actually_won, jnp.arange(n, dtype=jnp.int32), -1)
        new_owner = new_owner.at[best].max(winners, mode="drop")
        return (new_prices, new_owner), None

    prices0 = jnp.zeros((n,))
    owner0 = jnp.full((n,), -1, jnp.int32)
    (prices, owner), _ = lax.scan(round_fn, (prices0, owner0), None, length=iterations)

    # assignment per bidder (unassigned -> greedy best remaining approximated
    # by argmax of net value)
    assignment = jnp.full((n,), -1, jnp.int32)
    assignment = assignment.at[owner].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    # owner maps item->bidder; invert to bidder->item
    bidder_item = jnp.full((n,), -1, jnp.int32)
    valid_owner = owner >= 0
    bidder_item = bidder_item.at[jnp.where(valid_owner, owner, n)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop"
    )
    fallback = jnp.argmax(value - prices[None, :], axis=1).astype(jnp.int32)
    bidder_item = jnp.where(bidder_item >= 0, bidder_item, fallback)
    matched = jnp.take_along_axis(d2, bidder_item[:, None], axis=1)[:, 0]
    return bidder_item, jnp.mean(matched)

"""Greedy radius NMS, device-resident.

Parity target: the reference's sequential first-come NMS
(`experiments/lcrnet/modules/vote/vote.py:6-110`): walk nodes in index order,
keep a node iff it is farther than ``radius`` from every previously kept node.

TPU design: the greedy result is the lexicographically-first maximal
independent set of the conflict graph, which we compute with the
deterministic parallel-greedy iteration — each round finalizes every
undecided node whose decision no longer depends on earlier undecided nodes.
Rounds are whole-matrix VPU ops on the (M, M) adjacency; for geometric
conflict graphs convergence takes O(chain length) rounds (typically < 20),
versus M fully-sequential steps in the reference.  Result is *bit-identical*
to the sequential greedy order.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

from lcrnet_tpu.ops.pairwise_distance import pairwise_distance


def greedy_radius_nms(
    nodes: jnp.ndarray,
    mask: jnp.ndarray,
    radius: float,
) -> jnp.ndarray:
    """First-come greedy NMS keep-mask over (M, 3) nodes.

    A node conflicts with another iff their distance <= radius (note: the
    reference keeps a node when dist > radius to all kept nodes —
    `vote.py:52-54`).  Invalid nodes are never kept.

    Returns keep (M,) bool.
    """
    m = nodes.shape[0]
    sq = pairwise_distance(nodes, nodes)
    adj = sq <= radius * radius
    idx = jnp.arange(m)
    adj = jnp.logical_and(adj, idx[:, None] != idx[None, :])  # no self-conflict
    adj = jnp.logical_and(adj, mask[:, None])
    adj = jnp.logical_and(adj, mask[None, :])
    earlier = idx[None, :] < idx[:, None]  # (i, j): j earlier than i
    adj_earlier = jnp.logical_and(adj, earlier)

    def cond(state):
        keep, dead = state
        return jnp.any(jnp.logical_not(jnp.logical_or(keep, dead)))

    def body(state):
        keep, dead = state
        undecided = jnp.logical_not(jnp.logical_or(keep, dead))
        # a node is a leader when no *earlier undecided* node conflicts with it
        blocked = jnp.any(jnp.logical_and(adj_earlier, undecided[None, :]), axis=1)
        leaders = jnp.logical_and(undecided, jnp.logical_not(blocked))
        keep = jnp.logical_or(keep, leaders)
        killed = jnp.any(jnp.logical_and(adj, leaders[None, :]), axis=1)
        dead = jnp.logical_or(dead, jnp.logical_and(undecided, killed))
        return keep, dead

    keep0 = jnp.zeros((m,), jnp.bool_)
    dead0 = jnp.logical_not(mask)
    keep, _ = lax.while_loop(cond, body, (keep0, dead0))
    return keep


def compact_by_mask(
    values: jnp.ndarray,
    keep: jnp.ndarray,
    capacity: int,
    pad_value: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Gather kept rows to the front of a fixed-capacity buffer.

    Order-preserving compaction: row i of the output is the i-th kept input
    row.  Returns (out (capacity, ...), out_mask (capacity,),
    src_indices (capacity,) int32 — index into the input for each output row).
    """
    m = keep.shape[0]
    pos = jnp.cumsum(keep.astype(jnp.int32)) - 1  # output slot per kept row
    count = jnp.sum(keep.astype(jnp.int32))
    slot = jnp.where(keep, pos, capacity)  # dropped rows scatter out of range
    src = jnp.full((capacity,), m, jnp.int32).at[slot].set(
        jnp.arange(m, dtype=jnp.int32), mode="drop"
    )
    out_mask = jnp.arange(capacity) < jnp.minimum(count, capacity)
    padded = jnp.concatenate(
        [values, jnp.full((1,) + values.shape[1:], pad_value, values.dtype)], axis=0
    )
    out = padded[jnp.where(out_mask, src, m)]
    return out, out_mask, src

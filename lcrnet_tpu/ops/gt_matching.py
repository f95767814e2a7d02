"""Ground-truth correspondence generation (training targets).

Parity targets (all re-expressed with static shapes):
  - `experiments/lcrnet/modules/registration/matching.py:251-368`
    (`get_node_correspondences`: sphere-intersection prefilter, per patch
    pair mean of two one-sided point-overlap ratios at pos_radius)
  - `matching.py:442-516` (`get_node_correspondences_disance`: mutual
    nearest-node mask; NOTE the reference compares *squared* distance to the
    *unsquared* radius — replicated verbatim since the model was trained
    with it)

TPU design: instead of nonzero() over the intersect matrix (data-dependent
count), the top ``capacity`` candidate pairs by intersection margin are
selected with a fixed-shape top-k, and patch overlaps are computed for the
candidate block in chunks.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from lcrnet_tpu.ops.masked import masked_top_k
from lcrnet_tpu.ops.pairwise_distance import pairwise_distance
from lcrnet_tpu.ops.transform import apply_transform

_BIG = 1.0e12


class NodeCorrespondences(NamedTuple):
    ref_indices: jnp.ndarray   # (C,) int32
    src_indices: jnp.ndarray   # (C,) int32
    overlaps: jnp.ndarray      # (C,) float32
    valid: jnp.ndarray         # (C,) bool


def get_node_correspondences(
    ref_nodes: jnp.ndarray,
    src_nodes: jnp.ndarray,
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    transform: jnp.ndarray,
    pos_radius: float,
    ref_masks: jnp.ndarray,
    src_masks: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    capacity: int = 1024,
    chunk: int = 128,
) -> NodeCorrespondences:
    """GT node (patch) correspondences with overlap ratios.

    Args mirror the reference; ``capacity`` is the static candidate budget
    (the reference's data-dependent nonzero() set), ``chunk`` the block size
    for the (chunk, K, K) point-distance tensors.
    """
    m = ref_nodes.shape[0]
    n = src_nodes.shape[0]
    k = ref_knn_points.shape[1]

    src_nodes_t = apply_transform(src_nodes, transform)
    src_knn_t = apply_transform(src_knn_points.reshape(-1, 3), transform).reshape(n, k, 3)

    # sphere-intersection prefilter (reference matching.py:312-323)
    ref_r = jnp.max(
        jnp.where(
            ref_knn_masks,
            jnp.linalg.norm(ref_knn_points - ref_nodes[:, None, :], axis=-1),
            0.0,
        ),
        axis=1,
    )
    src_r = jnp.max(
        jnp.where(
            src_knn_masks,
            jnp.linalg.norm(src_knn_t - src_nodes_t[:, None, :], axis=-1),
            0.0,
        ),
        axis=1,
    )
    dist = jnp.sqrt(pairwise_distance(ref_nodes, src_nodes_t))
    margin = ref_r[:, None] + src_r[None, :] + pos_radius - dist
    pair_valid = jnp.logical_and(margin > 0, ref_masks[:, None])
    pair_valid = jnp.logical_and(pair_valid, src_masks[None, :])

    # static candidate selection: top `capacity` pairs by margin
    _, flat_idx, cand_valid = masked_top_k(margin.reshape(-1), pair_valid.reshape(-1), capacity)
    cand_ref = (flat_idx // n).astype(jnp.int32)
    cand_src = (flat_idx % n).astype(jnp.int32)

    pad = (-capacity) % chunk
    cr = jnp.pad(cand_ref, (0, pad)).reshape(-1, chunk)
    cs = jnp.pad(cand_src, (0, pad)).reshape(-1, chunk)

    def overlap_chunk(args):
        ref_i, src_i = args
        rp = ref_knn_points[ref_i]          # (chunk, K, 3)
        rm = ref_knn_masks[ref_i]
        sp = src_knn_t[src_i]
        sm = src_knn_masks[src_i]
        d2 = pairwise_distance(rp, sp)      # (chunk, K, K)
        mm = jnp.logical_and(rm[:, :, None], sm[:, None, :])
        d2 = jnp.where(mm, d2, _BIG)
        hit = d2 < pos_radius ** 2
        ref_cnt = jnp.sum(jnp.any(hit, axis=2), axis=1).astype(jnp.float32)
        src_cnt = jnp.sum(jnp.any(hit, axis=1), axis=1).astype(jnp.float32)
        ref_tot = jnp.maximum(jnp.sum(rm, axis=1).astype(jnp.float32), 1.0)
        src_tot = jnp.maximum(jnp.sum(sm, axis=1).astype(jnp.float32), 1.0)
        return 0.5 * (ref_cnt / ref_tot + src_cnt / src_tot)

    overlaps = lax.map(overlap_chunk, (cr, cs)).reshape(-1)[:capacity]
    valid = jnp.logical_and(cand_valid, overlaps > 0.0)
    return NodeCorrespondences(cand_ref, cand_src, overlaps, valid)


def node_correspondence_distance_mask(
    ref_nodes: jnp.ndarray,
    src_nodes: jnp.ndarray,
    transform: jnp.ndarray,
    pos_radius: float,
    ref_masks: jnp.ndarray,
    src_masks: jnp.ndarray,
) -> jnp.ndarray:
    """Mutual nearest-node mask under the GT transform (reference
    `matching.py:442-516`; the squared-vs-unsquared comparison is kept)."""
    m, n = ref_nodes.shape[0], src_nodes.shape[0]
    src_t = apply_transform(src_nodes, transform)
    d2 = pairwise_distance(ref_nodes, src_t)
    d2 = jnp.where(ref_masks[:, None], d2, _BIG)
    d2 = jnp.where(src_masks[None, :], d2, _BIG)

    ref_min_idx = jnp.argmin(d2, axis=1)
    ref_min = jnp.min(d2, axis=1)
    ref_hit = ref_min < pos_radius  # NB: squared distance vs radius (sic)
    mask_a = jnp.zeros((m, n), jnp.bool_).at[jnp.arange(m), ref_min_idx].set(ref_hit)

    src_min_idx = jnp.argmin(d2, axis=0)
    src_min = jnp.min(d2, axis=0)
    src_hit = src_min < pos_radius
    mask_b = jnp.zeros((m, n), jnp.bool_).at[src_min_idx, jnp.arange(n)].set(src_hit)

    masks = jnp.logical_or(mask_a, mask_b)
    masks = jnp.logical_and(masks, ref_masks[:, None])
    masks = jnp.logical_and(masks, src_masks[None, :])
    return masks


def sample_targets(
    correspondences: NodeCorrespondences,
    overlap_threshold: float,
    num_targets: int,
    key,
) -> NodeCorrespondences:
    """SuperPointTargetGenerator (reference `superpoint_target.py:6-43`):
    random subset of up to num_targets correspondences with
    overlap > threshold — fixed-capacity via random-priority top-k."""
    import jax

    eligible = jnp.logical_and(correspondences.valid, correspondences.overlaps > overlap_threshold)
    priority = jax.random.uniform(key, correspondences.overlaps.shape)
    _, sel, sel_valid = masked_top_k(priority, eligible, num_targets)
    return NodeCorrespondences(
        ref_indices=correspondences.ref_indices[sel],
        src_indices=correspondences.src_indices[sel],
        overlaps=correspondences.overlaps[sel],
        valid=sel_valid,
    )

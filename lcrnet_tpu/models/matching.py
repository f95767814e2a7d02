"""Coarse (node) matching and fine matching with local-to-global registration.

Parity targets:
  - `experiments/lcrnet/modules/geotransformer/superpoint_matching.py:91-186`
    (SuperPointMatching_OT: dustbin mode = union of row/col argmax beating
    the dustbin; fixed-count mode = threshold sweep)
  - `modules/geotransformer/local_global_registration.py:11-246` (LGR:
    top-k row/col selection vs dustbin, per-patch weighted Procrustes,
    best-by-inlier-count, 5 refinement rounds)

TPU design: every data-dependent set (nonzero(), chunks, threshold sweeps)
becomes a fixed-capacity masked selection:
  * node correspondences: scatter the argmax-beats-dustbin matrix, take the
    top `capacity` scores (capacity >= M+N covers the worst case exactly);
  * dense correspondences: each patch contributes at most 2K candidates
    (K row-side + K col-side with duplicate suppression), the global
    verification set is the top `corr_limit` by score;
  * the per-patch transform fleet and inlier counts are one batched
    Procrustes + one blocked residual pass.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
from jax import lax

from lcrnet_tpu.ops.masked import masked_top_k
from lcrnet_tpu.ops.procrustes import weighted_procrustes
from lcrnet_tpu.ops.transform import apply_transform


class NodeCorrResult(NamedTuple):
    ref_indices: jnp.ndarray  # (C,) int32
    src_indices: jnp.ndarray  # (C,) int32
    scores: jnp.ndarray       # (C,)
    valid: jnp.ndarray        # (C,) bool


def coarse_matching_ot(
    matching_scores: jnp.ndarray,
    ref_masks: jnp.ndarray,
    src_masks: jnp.ndarray,
    capacity: int,
    num_correspondences: Optional[int] = None,
    ref_node_scores: Optional[jnp.ndarray] = None,
    src_node_scores: Optional[jnp.ndarray] = None,
    threshold_sweep: bool = True,
) -> NodeCorrResult:
    """Extract node correspondences from an OT log-score matrix.

    Args:
      matching_scores: (M+1, N+1) log OT scores (dustbin at index -1).
      ref_masks/src_masks: (M,)/(N,) node validity.
      capacity: static output size (use >= M+N to cover dustbin mode exactly).
      num_correspondences: None = dustbin mode; int = fixed-count mode.
      threshold_sweep: fixed-count semantics.  True (default) replicates the
        reference exactly (`superpoint_matching.py:162-186`): sweep a
        threshold 0.5, 0.49, ... downward until >= k entries exceed it, then
        keep ALL above-threshold entries (possibly more than k, bounded here
        by `capacity`).  The sweep has a closed form: with v_k the k-th
        largest valid score, the stopping threshold is the largest grid
        value strictly below v_k.  False = plain top-k (keeps exactly k —
        a prefix of the reference's set under the same ordering).
      ref_node_scores/src_node_scores: optional per-node overlap scores that
        multiply the matching scores in fixed-count mode
        (`superpoint_matching.py:166-172`).
    """
    m = matching_scores.shape[0] - 1
    n = matching_scores.shape[1] - 1
    scores = jnp.exp(matching_scores)

    valid_mat = jnp.logical_and(ref_masks[:, None], src_masks[None, :])

    if num_correspondences is None:
        inner = scores[:-1, :-1]
        # column side: best row per column must beat the dustbin row
        col_best = jnp.argmax(inner, axis=0)
        col_val = jnp.max(inner, axis=0)
        col_beats = col_val > scores[-1, :-1]
        src_corr = jnp.zeros((m, n), jnp.bool_).at[col_best, jnp.arange(n)].set(col_beats)
        # row side: best column per row must beat the dustbin column
        row_best = jnp.argmax(inner, axis=1)
        row_val = jnp.max(inner, axis=1)
        row_beats = row_val > scores[:-1, -1]
        ref_corr = jnp.zeros((m, n), jnp.bool_).at[jnp.arange(m), row_best].set(row_beats)
        corr_mat = jnp.logical_or(ref_corr, src_corr)
        corr_mat = jnp.logical_and(corr_mat, valid_mat)
        sel_scores = jnp.where(corr_mat, inner, 0.0)
    else:
        inner = scores[:-1, :-1]
        if ref_node_scores is not None and src_node_scores is not None:
            inner = inner * ref_node_scores[:, None] * src_node_scores[None, :]
        corr_mat = valid_mat
        sel_scores = jnp.where(corr_mat, inner, 0.0)
        if threshold_sweep:
            # closed-form sweep (`superpoint_matching.py:173-183`): the loop
            # stops at the first threshold t in {0.5 - 0.01 j} with
            # count(score > t) >= k, i.e. the first t strictly below the
            # k-th largest score v_k; kept set = ALL entries > t.  The
            # reference clamps k to the matrix size when the cloud is
            # smaller; with masked static shapes the analogue is the
            # smallest VALID value among the top-k (= c-th largest when only
            # c < k entries are valid).
            k_eff = min(num_correspondences, m, n)
            kv, _, kok = masked_top_k(
                sel_scores.reshape(-1), corr_mat.reshape(-1), k_eff)
            v_k = jnp.min(jnp.where(kok, kv, jnp.inf))
            j_star = jnp.maximum(0.0, jnp.floor((0.5 - v_k) / 0.01) + 1.0)
            thres = 0.5 - 0.01 * j_star
            corr_mat = jnp.logical_and(corr_mat, sel_scores > thres)
            sel_scores = jnp.where(corr_mat, sel_scores, 0.0)
            # capacity stays the configured node budget: the above-threshold
            # set is data-dependent (>= k); top-capacity keeps all of it
            # whenever its size <= capacity
        else:
            capacity = num_correspondences

    vals, flat_idx, valid = masked_top_k(sel_scores.reshape(-1), corr_mat.reshape(-1), capacity)
    ref_idx = (flat_idx // n).astype(jnp.int32)
    src_idx = (flat_idx % n).astype(jnp.int32)
    valid = jnp.logical_and(valid, vals > 0.0)
    return NodeCorrResult(ref_idx, src_idx, vals, valid)


def coarse_matching_dual_norm(
    ref_feats: jnp.ndarray,
    src_feats: jnp.ndarray,
    ref_masks: jnp.ndarray,
    src_masks: jnp.ndarray,
    num_correspondences: int,
    dual_normalization: bool = True,
) -> NodeCorrResult:
    """Legacy feature-distance coarse matching (reference
    `superpoint_matching.py:7-50` SuperPointMatching): exp(-d2) scores over
    normalized features, optional dual (row+column) normalization, global
    top-k.  Kept for capability parity; the shipped pipeline uses the OT
    variant."""
    from lcrnet_tpu.ops.pairwise_distance import pairwise_distance

    m, n = ref_feats.shape[0], src_feats.shape[0]
    scores = jnp.exp(-pairwise_distance(ref_feats, src_feats, normalized=True))
    valid = jnp.logical_and(ref_masks[:, None], src_masks[None, :])
    scores = jnp.where(valid, scores, 0.0)
    if dual_normalization:
        ref_norm = scores / jnp.maximum(jnp.sum(scores, axis=1, keepdims=True), 1e-12)
        src_norm = scores / jnp.maximum(jnp.sum(scores, axis=0, keepdims=True), 1e-12)
        scores = ref_norm * src_norm
    vals, flat_idx, ok = masked_top_k(scores.reshape(-1), valid.reshape(-1), num_correspondences)
    return NodeCorrResult(
        (flat_idx // n).astype(jnp.int32),
        (flat_idx % n).astype(jnp.int32),
        vals,
        jnp.logical_and(ok, vals > 0.0),
    )


class FineMatchResult(NamedTuple):
    ref_corr_points: jnp.ndarray  # (C_glob, 3)
    src_corr_points: jnp.ndarray  # (C_glob, 3)
    corr_scores: jnp.ndarray      # (C_glob,)
    corr_valid: jnp.ndarray       # (C_glob,) bool
    estimated_transform: jnp.ndarray  # (4, 4)


def fine_matching_lgr(
    ref_knn_points: jnp.ndarray,
    src_knn_points: jnp.ndarray,
    ref_knn_masks: jnp.ndarray,
    src_knn_masks: jnp.ndarray,
    matching_scores: jnp.ndarray,
    patch_valid: jnp.ndarray,
    acceptance_radius: float,
    corr_limit: int,
    topk: int = 1,
    mutual: bool = False,
    use_dustbin: bool = True,
    confidence_threshold: float = 0.0,
    correspondence_threshold: int = 3,
    num_refinement_steps: int = 5,
    chunk: int = 64,
) -> FineMatchResult:
    """Local-to-global registration from per-patch OT scores.

    Args:
      ref_knn_points/src_knn_points: (P, K, 3) patch points per node corr.
      ref_knn_masks/src_knn_masks: (P, K).
      matching_scores: (P, K+1, K+1) log OT scores (if use_dustbin) else (P, K, K).
      patch_valid: (P,) node-correspondence validity.
      corr_limit: static global correspondence budget.
      topk: per-row/per-column candidate count (reference
        `local_global_registration.py:49-91` self.k; shipped config uses 1).
    """
    p, k = ref_knn_masks.shape
    scores = jnp.exp(matching_scores)

    if use_dustbin:
        inner = scores[:, :-1, :-1]
        row_dust = scores[:, :-1, -1]   # (P, K) dustbin col per row
        col_dust = scores[:, -1, :-1]   # (P, K) dustbin row per col
    else:
        inner = scores
        row_dust = jnp.full((p, k), confidence_threshold, scores.dtype)
        col_dust = jnp.full((p, k), confidence_threshold, scores.dtype)

    mask_mat = jnp.logical_and(ref_knn_masks[:, :, None], src_knn_masks[:, None, :])
    inner_masked = jnp.where(mask_mat, inner, 0.0)

    def _topk_last(x, kk):
        # k == 1 (the shipped config, `config_model.py:85`) needs no sort:
        # max + argmax match lax.top_k exactly (both take the first of tied
        # maxima).  lax.top_k here lowered to a FULL last-dim sort, and with
        # a pair batch dim XLA's chosen sort variant measured ~306 ms per
        # call at (2, 1024, 128, 128) — 70% of the whole multi-pair forward
        # (1.6 ms for the identical shape without the extra dim; the
        # max/argmax formulation is flat in batch).
        if kk == 1:
            return (
                jnp.max(x, axis=-1, keepdims=True),
                jnp.argmax(x, axis=-1, keepdims=True).astype(jnp.int32),
            )
        return lax.top_k(x, kk)

    # row-side candidates: (p, i) -> topk j's beating the row dustbin
    row_val, row_best = _topk_last(inner_masked, topk)           # (P, K, k)
    row_ok = row_val > row_dust[:, :, None]
    # col-side candidates: (p, j) -> topk i's beating the col dustbin
    col_val, col_best = _topk_last(jnp.swapaxes(inner_masked, 1, 2), topk)  # (P, K, k)
    col_ok = col_val > col_dust[:, :, None]

    if mutual:
        # reference mutual mode: (i, j) kept iff selected from BOTH sides —
        # row candidate (i, j) also appears among j's column top-k winners
        j_of_i = row_best                                         # (P, K, k)
        # col_best gathered at j: (P, K, k, k') = i-candidates of column j
        col_best_at_j = jnp.take_along_axis(
            col_best[:, :, None, :], j_of_i[:, :, :, None], axis=1
        )
        col_ok_at_j = jnp.take_along_axis(
            col_ok[:, :, None, :], j_of_i[:, :, :, None], axis=1
        )
        i_ids = jnp.arange(k)[None, :, None, None]
        in_col = jnp.any(jnp.logical_and(col_best_at_j == i_ids, col_ok_at_j), axis=-1)
        row_ok = jnp.logical_and(row_ok, in_col)
        col_ok = jnp.zeros_like(col_ok)
    else:
        # duplicate suppression: col candidate (i*, j) is already emitted by
        # the row side iff j appears among row i*'s kept top-k winners
        i_of_j = col_best                                         # (P, K, k)
        row_best_at_i = jnp.take_along_axis(
            row_best[:, :, None, :], i_of_j[:, :, :, None], axis=1
        )                                                         # (P, K, k, k')
        row_ok_at_i = jnp.take_along_axis(
            row_ok[:, :, None, :], i_of_j[:, :, :, None], axis=1
        )
        j_ids = jnp.arange(k)[None, :, None, None]
        dup = jnp.any(jnp.logical_and(row_best_at_i == j_ids, row_ok_at_i), axis=-1)
        col_ok = jnp.logical_and(col_ok, jnp.logical_not(dup))

    row_ok = jnp.logical_and(row_ok, patch_valid[:, None, None])
    col_ok = jnp.logical_and(col_ok, patch_valid[:, None, None])
    row_ok = jnp.logical_and(row_ok, ref_knn_masks[:, :, None])
    col_ok = jnp.logical_and(col_ok, src_knn_masks[:, :, None])
    row_ok = jnp.logical_and(row_ok, row_val > 0.0)
    col_ok = jnp.logical_and(col_ok, col_val > 0.0)

    # assemble (P, 2*K*topk) candidates
    kk = k * topk
    ids = jnp.broadcast_to(jnp.arange(k)[None, :, None], (p, k, topk)).reshape(p, kk)
    cand_ref_idx = jnp.concatenate([ids, col_best.reshape(p, kk)], axis=1)
    cand_src_idx = jnp.concatenate([row_best.reshape(p, kk), ids], axis=1)
    cand_scores = jnp.concatenate([row_val.reshape(p, kk), col_val.reshape(p, kk)], axis=1)
    cand_valid = jnp.concatenate([row_ok.reshape(p, kk), col_ok.reshape(p, kk)], axis=1)
    cand_scores = jnp.where(cand_valid, cand_scores, 0.0)

    # candidate points: the row-side ref indices and col-side src indices
    # are the IDENTITY (ids), so only the two cross-selections need a
    # gather — half the rows of the naive (P, 2kk, 3) take_along_axis pair
    # (which measured 7.6 ms/forward); both cross-selections ride one flat
    # row gather, and the reshapes are bitcasts (kk is a sublane-tile
    # multiple)
    base = (jnp.arange(p, dtype=jnp.int32) * k)[:, None]
    flat_pts = jnp.concatenate(
        [ref_knn_points.reshape(p * k, 3), src_knn_points.reshape(p * k, 3)], axis=0
    )
    col_ref_idx = col_best.reshape(p, kk)    # ref points chosen by columns
    row_src_idx = row_best.reshape(p, kk)    # src points chosen by rows
    flat_idx = jnp.concatenate(
        [(col_ref_idx + base).reshape(-1), (row_src_idx + base).reshape(-1) + p * k]
    )
    both = flat_pts[flat_idx].reshape(2, p, kk, 3)
    cand_ref_pts = jnp.concatenate([ref_knn_points[:, :k].repeat(topk, 1)[:, :kk], both[0]], axis=1)
    cand_src_pts = jnp.concatenate([both[1], src_knn_points[:, :k].repeat(topk, 1)[:, :kk]], axis=1)

    # per-patch local registration (reference `local_global_registration.py:174-186`)
    patch_counts = jnp.sum(cand_valid.astype(jnp.int32), axis=1)
    patch_ok = jnp.logical_and(patch_valid, patch_counts >= correspondence_threshold)
    patch_transforms = weighted_procrustes(cand_src_pts, cand_ref_pts, cand_scores)

    # global verification set: top corr_limit candidates by score
    g_vals, g_idx, g_valid = masked_top_k(
        cand_scores.reshape(-1), cand_valid.reshape(-1), corr_limit
    )
    flat_ref = cand_ref_pts.reshape(-1, 3)
    flat_src = cand_src_pts.reshape(-1, 3)
    ref_corr = flat_ref[g_idx]
    src_corr = flat_src[g_idx]
    corr_scores = jnp.where(g_valid, g_vals, 0.0)

    # inlier counting per patch transform, blocked over patches
    pad = (-p) % chunk

    def count_chunk(transforms):
        aligned = apply_transform(src_corr[None, :, :], transforms)  # (chunk, C, 3)
        res = jnp.linalg.norm(ref_corr[None, :, :] - aligned, axis=-1)
        inl = jnp.logical_and(res < acceptance_radius, g_valid[None, :])
        return jnp.sum(inl.astype(jnp.int32), axis=1)

    pt_pad = jnp.concatenate(
        [patch_transforms, jnp.broadcast_to(jnp.eye(4), (pad, 4, 4))], axis=0
    ) if pad else patch_transforms
    counts = lax.map(count_chunk, pt_pad.reshape(-1, chunk, 4, 4)).reshape(-1)[:p]
    counts = jnp.where(patch_ok, counts, -1)

    best = jnp.argmax(counts)
    any_patch = jnp.any(patch_ok)

    # degenerate branch: fit on all correspondences, then re-score
    degen_transform = weighted_procrustes(src_corr, ref_corr, corr_scores)

    def inliers_of(transform):
        aligned = apply_transform(src_corr, transform)
        res = jnp.linalg.norm(ref_corr - aligned, axis=-1)
        return jnp.logical_and(res < acceptance_radius, g_valid).astype(corr_scores.dtype)

    best_scores = corr_scores * inliers_of(patch_transforms[best])
    degen_scores = corr_scores * inliers_of(degen_transform)
    cur_scores = jnp.where(any_patch, best_scores, degen_scores)

    # global refinement: num_refinement_steps Procrustes passes
    estimated = weighted_procrustes(src_corr, ref_corr, cur_scores)
    for _ in range(num_refinement_steps - 1):
        cur_scores = corr_scores * inliers_of(estimated)
        estimated = weighted_procrustes(src_corr, ref_corr, cur_scores)

    return FineMatchResult(
        ref_corr_points=ref_corr,
        src_corr_points=src_corr,
        corr_scores=corr_scores,
        corr_valid=g_valid,
        estimated_transform=estimated,
    )

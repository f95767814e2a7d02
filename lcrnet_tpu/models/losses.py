"""Training losses and the registration evaluator.

Parity targets (all re-expressed with explicit masks for the padded layout):
  - `experiments/lcrnet/loss_reg.py:96-159` (`gap`: circle-style gap loss on
    the patch OT matrix with dustbin rows)
  - `loss_reg.py:163-231` (`node_gap`: same structure on the node OT matrix
    against GT overlaps)
  - `loss_reg.py:48-92` (`VoteLoss_new`: masked two-way chamfer between
    shifted node sets under the GT transform)
  - `loss_reg.py:21-45` (`SingleSideChamferLoss_Brute`: nodes -> points)
  - `loss_reg.py:234-276` (`node_overlap_Loss`: weighted BCE)
  - `LCRNet_Matching.py:394-396` (rotary-theta regularizer |theta| <= pi)
  - `LCRNet_Matching.py:359-413` (`OverallLoss_new` composition)
  - `loss_reg.py:278-334` (`Evaluator`: PIR / IR / RRE / RTE / RR)
  - `loss_ld.py:29-58` (`TripletLoss` for retrieval)

The reference filters padded/degenerate rows through an exact `== 1e12`
sentinel comparison (scores at masked OT entries are -1e12); here validity
masks are explicit and the means run over valid rows only — identical values
on real data, no sentinel arithmetic.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from lcrnet_tpu.config import LCRNetConfig
from lcrnet_tpu.ops.gt_matching import node_correspondence_distance_mask
from lcrnet_tpu.ops.masked import masked_mean, masked_min
from lcrnet_tpu.ops.pairwise_distance import pairwise_distance
from lcrnet_tpu.ops.transform import apply_transform

_BIG = 1.0e12


def _gap_one_side(scores, pos_mask, neg_mask, row_valid, gamma):
    """One orientation of the gap loss: rows of (R, C) score matrix.

    pos = mean of -score over positive entries per row; negatives contribute
    clamp(pos - (-score_neg) + gamma, 0); per-row loss = log(sum + 1); mean
    over valid rows (reference `loss_reg.py:130-147`).
    """
    pos_cnt = jnp.sum(pos_mask.astype(scores.dtype), axis=-1)
    pos = jnp.sum(jnp.where(pos_mask, -scores, 0.0), axis=-1) / jnp.maximum(pos_cnt, 1.0)
    neg = jnp.where(neg_mask, -scores, _BIG)
    g = jnp.maximum(pos[..., None] - neg + gamma, 0.0)
    per_row = jnp.log(jnp.sum(g, axis=-1) + 1.0)
    row_valid = jnp.logical_and(row_valid, pos_cnt > 0)
    return masked_mean(per_row, row_valid)


def fine_gap_loss(output: Dict, transform: jnp.ndarray, cfg: LCRNetConfig) -> jnp.ndarray:
    """Gap loss on the patch OT matrices (reference `loss_reg.py:96-159`)."""
    r = cfg.loss.fine_positive_radius
    gamma = cfg.loss.gap_gamma
    ref_pts = output["ref_node_corr_knn_points"]      # (P, K, 3)
    src_pts = output["src_node_corr_knn_points"]
    ref_m = output["ref_node_corr_knn_masks"]         # (P, K)
    src_m = output["src_node_corr_knn_masks"]
    scores = output["matching_scores"]                # (P, K+1, K+1)

    src_t = apply_transform(src_pts, jnp.broadcast_to(transform, (src_pts.shape[0], 4, 4)))
    d2 = pairwise_distance(ref_pts, src_t)            # (P, K, K)
    both = jnp.logical_and(ref_m[:, :, None], src_m[:, None, :])
    corr = jnp.logical_and(d2 < r * r, both)
    neg_inner = d2 > (2.0 * r) ** 2

    p, k = ref_m.shape
    # row orientation: (P, K, K+1)
    pos_mask = jnp.concatenate([corr, (jnp.sum(corr, axis=2) == 0)[..., None]], axis=2)
    neg_mask = jnp.concatenate([neg_inner, (jnp.sum(corr, axis=2) > 0)[..., None]], axis=2)
    loss_a = _gap_one_side(scores[:, :-1, :], pos_mask, neg_mask, ref_m, gamma)

    # column orientation: (P, K, K+1) on the transposed matrix
    corr_t = jnp.swapaxes(corr, 1, 2)
    neg_t = jnp.swapaxes(neg_inner, 1, 2)
    pos_mask_t = jnp.concatenate([corr_t, (jnp.sum(corr_t, axis=2) == 0)[..., None]], axis=2)
    neg_mask_t = jnp.concatenate([neg_t, (jnp.sum(corr_t, axis=2) > 0)[..., None]], axis=2)
    scores_t = jnp.swapaxes(scores, 1, 2)
    loss_b = _gap_one_side(scores_t[:, :-1, :], pos_mask_t, neg_mask_t, src_m, gamma)
    return 0.5 * (loss_a + loss_b)


def node_gap_loss(output: Dict, cfg: LCRNetConfig) -> jnp.ndarray:
    """Gap loss on the node OT matrix vs GT overlaps
    (reference `loss_reg.py:163-231`)."""
    gamma = cfg.loss.gap_gamma
    thr = cfg.loss.positive_overlap
    scores = output["node_matching_scores"]           # (M+1, N+1)
    ref_occ = output["node_occupied"][0]
    src_occ = output["node_occupied"][1]
    gt = output["gt_node_corr"]

    m = ref_occ.shape[0]
    n = src_occ.shape[0]
    overlaps = jnp.zeros((m, n), scores.dtype).at[
        gt.ref_indices, gt.src_indices
    ].max(jnp.where(gt.valid, gt.overlaps, 0.0), mode="drop")

    both = jnp.logical_and(ref_occ[:, None], src_occ[None, :])
    corr = jnp.logical_and(overlaps > thr, both)
    neg_inner = overlaps == 0.0

    pos_mask = jnp.concatenate([corr, (jnp.sum(corr, axis=1) == 0)[:, None]], axis=1)
    neg_mask = jnp.concatenate([neg_inner, (jnp.sum(corr, axis=1) > 0)[:, None]], axis=1)
    loss_a = _gap_one_side(scores[None, :-1, :], pos_mask[None], neg_mask[None], ref_occ[None], gamma)

    corr_t = corr.T
    neg_t = neg_inner.T
    pos_mask_t = jnp.concatenate([corr_t, (jnp.sum(corr_t, axis=1) == 0)[:, None]], axis=1)
    neg_mask_t = jnp.concatenate([neg_t, (jnp.sum(corr_t, axis=1) > 0)[:, None]], axis=1)
    loss_b = _gap_one_side(scores.T[None, :-1, :], pos_mask_t[None], neg_mask_t[None], src_occ[None], gamma)
    return 0.5 * (loss_a + loss_b)


def vote_loss(output: Dict, transform: jnp.ndarray, cfg: LCRNetConfig) -> jnp.ndarray:
    """Masked two-way chamfer between shifted node sets under GT
    (reference `loss_reg.py:48-92`); the row/col selection mask comes from
    mutual-nearest original stage-4 nodes (`matching.py:442-516`)."""
    shifted = output["shifted_points"]                # (2, N4, 3)
    masks_c = output["ori_masks_c"]
    ori = output["ori_points_c"]

    mask_mat = node_correspondence_distance_mask(
        ori[0], ori[1], transform, cfg.model.ground_truth_corres_radius, masks_c[0], masks_c[1]
    )
    src_t = apply_transform(shifted[1], transform)
    dist = jnp.sqrt(pairwise_distance(shifted[0], src_t))
    dist = jnp.where(masks_c[0][:, None], dist, _BIG)
    dist = jnp.where(masks_c[1][None, :], dist, _BIG)

    ref_sel = jnp.sum(mask_mat, axis=1) > 0
    src_sel = jnp.sum(mask_mat, axis=0) > 0
    fwd = masked_mean(jnp.min(dist, axis=1), ref_sel)
    bwd = masked_mean(jnp.min(dist, axis=0), src_sel)
    return fwd + bwd


def node_on_pc_loss(output: Dict) -> jnp.ndarray:
    """Single-side chamfer: shifted nodes -> fine points
    (reference `loss_reg.py:21-45`)."""
    shifted = output["shifted_points"]                # (2, N4, 3)
    masks_c = output["ori_masks_c"]
    points_f = output["points_f"]                     # (2, N0, 3)
    masks_f = output["masks_f"]

    total = 0.0
    for b in range(2):
        d = jnp.sqrt(pairwise_distance(shifted[b], points_f[b]))
        d = jnp.where(masks_f[b][None, :], d, _BIG)
        total = total + masked_mean(jnp.min(d, axis=1), masks_c[b])
    return total / 2.0


def node_overlap_loss(output: Dict) -> jnp.ndarray:
    """Weighted BCE on the node overlap score (reference `loss_reg.py:234-276`)."""
    gt = output["gt_node_corr"]
    score = output["node_scores"]                     # (2, M)
    node_masks = output["node_masks"]
    m = score.shape[1]

    ref_gt = jnp.zeros((m,), score.dtype).at[gt.ref_indices].max(
        gt.valid.astype(score.dtype), mode="drop"
    )
    src_gt = jnp.zeros((m,), score.dtype).at[gt.src_indices].max(
        gt.valid.astype(score.dtype), mode="drop"
    )
    labels = jnp.stack([ref_gt, src_gt]).reshape(-1)
    preds = jnp.clip(score.reshape(-1), 1e-7, 1.0 - 1e-7)
    valid = node_masks.reshape(-1)

    bce = -(labels * jnp.log(preds) + (1.0 - labels) * jnp.log(1.0 - preds))
    n_valid = jnp.maximum(jnp.sum(valid.astype(score.dtype)), 1.0)
    w_neg = jnp.sum(jnp.where(valid, labels, 0.0)) / n_valid
    w_pos = 1.0 - w_neg
    weights = jnp.where(labels >= 0.5, w_pos, w_neg)
    return masked_mean(weights * bce, valid)


def theta_regularizer(output: Dict) -> jnp.ndarray:
    """Keep rotary angles within |theta| <= pi
    (reference `LCRNet_Matching.py:394-396`)."""
    theta = output["theta"]                           # (2, N4, D)
    masks = output["ori_masks_c"]
    excess = jnp.maximum(jnp.abs(theta) - jnp.pi, 0.0)
    return 0.5 * (
        masked_mean(jnp.mean(excess[0], axis=-1), masks[0])
        + masked_mean(jnp.mean(excess[1], axis=-1), masks[1])
    )


def overall_loss(output: Dict, transform: jnp.ndarray, cfg: LCRNetConfig) -> Dict[str, jnp.ndarray]:
    """OverallLoss_new (reference `LCRNet_Matching.py:359-413`)."""
    c_loss = cfg.loss.weight_coarse_loss * node_gap_loss(output, cfg)
    g_loss = cfg.loss.weight_gap_loss * fine_gap_loss(output, transform, cfg)
    reg_loss = theta_regularizer(output)
    v_loss = cfg.loss.weight_vote_loss * vote_loss(output, transform, cfg)
    d_loss = cfg.loss.weight_vote_loss * node_on_pc_loss(output)
    n_loss = node_overlap_loss(output)
    loss = c_loss + g_loss + reg_loss + v_loss + d_loss + n_loss
    return {
        "loss": loss,
        "c_loss": c_loss,
        "g_loss": g_loss,
        "reg_loss": reg_loss,
        "v_loss": v_loss,
        "d_loss": d_loss,
        "n_loss": n_loss,
    }


def triplet_loss(anc_global, pos_global, neg_global, margin: float) -> jnp.ndarray:
    """Lazy-triplet retrieval loss (reference `loss_ld.py:29-58`): hardest
    (max-distance) positive vs every negative, sum over negatives, mean over
    the batch.  anc (B, 1, D), pos (B, P, D), neg (B, N, D)."""
    pos_d = jnp.sum((pos_global - anc_global) ** 2, axis=2)  # (B, P)
    positive = jnp.max(pos_d, axis=1, keepdims=True)         # (B, 1)
    neg_d = jnp.sum((neg_global - anc_global) ** 2, axis=2)  # (B, N)
    t = jnp.maximum(margin + positive - neg_d, 0.0)
    return jnp.mean(jnp.sum(t, axis=1))


# ---------------------------------------------------------------------------
# Evaluator (reference `loss_reg.py:278-334`)


def isotropic_transform_error(gt_transform, est_transform):
    """RRE (deg) and RTE (m) (reference `modules/registration/metrics.py`).

    The rotation error uses the chord form 2*arcsin(||Re - Rg||_F / (2*sqrt 2))
    instead of the reference's arccos((tr - 1)/2): both are exact for
    rotations, but arccos near 1 has an f32 precision floor of ~0.1 deg
    (errors quantize to 0 or a few degrees), while arcsin near 0 is stable —
    sub-0.01-degree errors survive in float32."""
    gt_r = gt_transform[..., :3, :3]
    est_r = est_transform[..., :3, :3]
    gt_t = gt_transform[..., :3, 3]
    est_t = est_transform[..., :3, 3]
    chord = jnp.linalg.norm(
        (est_r - gt_r).reshape(gt_r.shape[:-2] + (9,)), axis=-1
    )
    x = jnp.clip(chord / (2.0 * jnp.sqrt(2.0)), 0.0, 1.0)
    rre = jnp.degrees(2.0 * jnp.arcsin(x))
    rte = jnp.linalg.norm(gt_t - est_t, axis=-1)
    return rre, rte


def evaluate_pair(output: Dict, transform: jnp.ndarray, cfg: LCRNetConfig) -> Dict[str, jnp.ndarray]:
    """PIR / IR / RRE / RTE / RR for one pair."""
    result = {}
    # PIR: fraction of predicted node correspondences that are GT
    gt = output["gt_node_corr"]
    # node_masks is pair-major (2, max_nodes): row 0 = ref side, row 1 = src
    m = output["node_masks"][0].shape[0]
    n = output["node_masks"][1].shape[0]
    accept = gt.overlaps > cfg.eval.acceptance_overlap
    gt_map = jnp.zeros((m, n), jnp.float32).at[gt.ref_indices, gt.src_indices].max(
        jnp.logical_and(gt.valid, accept).astype(jnp.float32), mode="drop"
    )
    hits = gt_map[output["ref_node_corr_indices"], output["src_node_corr_indices"]]
    result["PIR"] = masked_mean(hits, output["node_corr_valid"])

    # IR: inlier ratio of extracted dense correspondences
    src_t = apply_transform(output["src_corr_points"], transform)
    d = jnp.linalg.norm(output["ref_corr_points"] - src_t, axis=1)
    inl = (d < cfg.eval.acceptance_radius).astype(jnp.float32)
    result["IR"] = masked_mean(inl, output["corr_valid"])

    rre, rte = isotropic_transform_error(transform, output["estimated_transform"])
    result["RRE"] = rre
    result["RTE"] = rte
    result["RR"] = jnp.logical_and(
        rre < cfg.eval.rre_threshold, rte < cfg.eval.rte_threshold
    ).astype(jnp.float32)
    return result

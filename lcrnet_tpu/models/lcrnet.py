"""The LCRNet model family.

Parity targets:
  - `experiments/lcrnet/model_family/LCRNet.py:25-339` (full model:
    keypoint detection + global descriptor + dense matching)
  - `model_family/LCRNet_Matching.py:24-356` (registration training/eval:
    GT node correspondences, overlap score head, target sampling in training)
  - `model_family/LCRNet_GlobalDescrition.py:10-160` (retrieval: encoder +
    NetVLAD descriptor path)

Naming map vs the reference: ref == pos (cloud 0 of a pair), src == anc
(cloud 1).  The cloud axis replaces the reference's ragged [pos..., anc...]
stacking; `num_pairs` > 1 processes several pairs in one program (pair-major
layout [(p0,ref),(p0,src),(p1,ref),...]) — the backbone is natively batched
and the matching heads vmap over the pair axis.  GroupNorm statistics stay
per pair (`norm_clouds=2`), so multi-pair results are identical to running
pairs one at a time.

One flax module covers the whole family: the global head and matching head
are always constructed (stable parameter tree — the reference's
`merge_model.py` checkpoint grafting becomes a trivial subtree copy), and
`describe()` exposes the retrieval-only path over single clouds (per-cloud
norm statistics).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from lcrnet_tpu.config import LCRNetConfig
from lcrnet_tpu.models.backbone import KPDecoder, KPEncoder, VoteEncoder
from lcrnet_tpu.models.kpconv import batched_gather
from lcrnet_tpu.models.matching import coarse_matching_ot, fine_matching_lgr
from lcrnet_tpu.models.netvlad import NetVLAD
from lcrnet_tpu.models.roformer import ThDRoFormer
from lcrnet_tpu.ops.gt_matching import NodeCorrespondences, get_node_correspondences, sample_targets
from lcrnet_tpu.ops.partition import point_to_node_partition
from lcrnet_tpu.ops.pyramid import Pyramid
from lcrnet_tpu.ops.sinkhorn import log_optimal_transport


def l2_normalize(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


class LCRNet(nn.Module):
    cfg: LCRNetConfig

    def setup(self):
        c = self.cfg
        self.encoder = KPEncoder(
            input_dim=c.backbone.input_dim,
            init_dim=c.backbone.init_dim,
            kernel_size=c.backbone.kernel_size,
            init_radius=c.backbone.init_radius,
            init_sigma=c.backbone.init_sigma,
            group_norm=c.backbone.group_norm,
            # both forward paths feed the mask column as the feature
            ones_features=c.backbone.input_dim == 1,
        )
        self.transformer = ThDRoFormer(
            input_dim=c.transformer.input_dim,
            hidden_dim=c.transformer.hidden_dim,
            output_dim=c.transformer.output_dim,
            num_heads=c.transformer.num_heads,
            num_layers=c.transformer.num_layers,
            topk_ratio=c.transformer.topk_ratio,
        )
        self.vote_encoder = VoteEncoder(
            init_dim=c.backbone.init_dim,
            kernel_size=c.backbone.kernel_size,
            init_radius=c.backbone.init_radius,
            init_sigma=c.backbone.init_sigma,
            group_norm=c.backbone.group_norm,
            nms_radius=c.vote.nms_radius,
            max_translate_range=c.vote.max_translate_range,
            input_feats_dim=c.vote.input_feats_dim,
            max_nodes=c.shapes.max_nodes,
            vote_neighbor_limit=c.shapes.vote_neighbor_limit,
            sub_neighbor_limit=c.shapes.neighbor_limits[-2],
            self_neighbor_limit=c.shapes.neighbor_limits[-1],
        )
        self.node_score_head = nn.Dense(1)
        self.kpdecoder = KPDecoder(init_dim=c.backbone.init_dim, group_norm=c.backbone.group_norm)
        self.netvlad = NetVLAD(
            feature_size=c.backbone.init_dim * 16,
            cluster_size=64,
            output_dim=c.backbone.output_dim,
        )
        self.node_ot_alpha = self.param("node_ot_alpha", nn.initializers.ones, ())
        self.point_ot_alpha = self.param("point_ot_alpha", nn.initializers.ones, ())

    # ------------------------------------------------------------------
    def describe(self, pyramid: Pyramid, frozen: bool = False) -> jnp.ndarray:
        """Retrieval path: (B, N, ...) pyramid -> (B, 256) global descriptors
        (reference `LCRNet_GlobalDescrition.py:66-74`).  Per-cloud norm
        statistics — batchmates do not couple.

        frozen=True stops gradients at the encoder output — the TPU
        equivalent of the reference's offline/half training modes
        (`LCRNet_GlobalDescrition.py:25-110`, cached encoder features): only
        the NetVLAD head trains, and the backward pass skips the backbone."""
        feats = pyramid.masks[0][..., None].astype(jnp.float32)
        feats_list = self.encoder(feats, pyramid, norm_clouds=1)
        enc_out = feats_list[3]
        if frozen:
            enc_out = jax.lax.stop_gradient(enc_out)
        feats_c = l2_normalize(enc_out, axis=-1)
        desc = self.netvlad(feats_c, pyramid.masks[3])
        return l2_normalize(desc, axis=-1)

    # ------------------------------------------------------------------
    def describe_with_cache(
        self,
        pyramid: Pyramid,
        cached_feats: jnp.ndarray,
        cached_masks: jnp.ndarray,
    ) -> jnp.ndarray:
        """Half-mode retrieval training path (reference
        `LCRNet_GlobalDescrition.py:78-86` + `data.py:235-287` half-online
        collate): the encoder runs — without gradients, as the reference's
        `torch.no_grad()` — on the ANCHOR clouds only, while positives and
        negatives arrive as pre-extracted stage-4 features
        (`experiments/preextract_features.py` dumps).  This is the
        throughput mode: per tuple, one encoder forward instead of
        1+num_pos+num_neg.

        Args:
          pyramid: anchor pyramid, B clouds.
          cached_feats: (B, G', C4, 1024) pos/neg stage-4 features
            (unnormalized, as dumped).
          cached_masks: (B, G', C4).
        Returns:
          (B, 1+G', 256) descriptors, anchor first within each tuple.
        """
        feats = pyramid.masks[0][..., None].astype(jnp.float32)
        feats_list = self.encoder(feats, pyramid, norm_clouds=1)
        anc_out = jax.lax.stop_gradient(feats_list[3])        # (B, C4, 1024)
        all_feats = jnp.concatenate([anc_out[:, None], cached_feats], axis=1)
        all_masks = jnp.concatenate(
            [pyramid.masks[3][:, None], cached_masks], axis=1)
        flat_f = all_feats.reshape((-1,) + all_feats.shape[2:])
        flat_m = all_masks.reshape((-1,) + all_masks.shape[2:])
        desc = self.netvlad(l2_normalize(flat_f, axis=-1), flat_m)
        desc = l2_normalize(desc, axis=-1)
        return desc.reshape(all_feats.shape[0], all_feats.shape[1], -1)

    # ------------------------------------------------------------------
    def __call__(
        self,
        pyramid: Pyramid,
        transform: Optional[jnp.ndarray] = None,
        training: bool = False,
        with_global_head: bool = True,
        with_fine_matching: bool = True,
        num_pairs: int = 1,
        spmd_axis: Optional[str] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Pair(s) forward.

        Args:
          pyramid: pyramid over 2*num_pairs clouds, pair-major.
          transform: (4, 4) GT src->ref (or (P, 4, 4) for multi-pair).
          training: GT-target path; requires transform and num_pairs == 1.
          num_pairs: static pair count P.
          spmd_axis: point-axis (mp) mesh axis name when called inside
            shard_map (see pipeline.make_pair_forward_mp): the KPConv
            encoder/decoder compute on per-device point shards with
            ring-halo exchange; node-scale modules run replicated.

        Output shapes: P == 1 keeps the single-pair contract (no pair axis
        on matching outputs); P > 1 adds a leading P axis to per-pair keys.
        """
        c = self.cfg
        p_pairs = num_pairs
        squeeze = p_pairs == 1
        out: Dict[str, jnp.ndarray] = {}

        points_c = pyramid.points[3]
        masks_c = pyramid.masks[3]
        points_f = pyramid.points[0]
        masks_f = pyramid.masks[0]
        out["points_f"] = points_f
        out["masks_f"] = masks_f
        out["ori_points_c"] = points_c
        out["ori_masks_c"] = masks_c

        transforms = None
        if transform is not None:
            transforms = transform[None] if transform.ndim == 2 else transform  # (P,4,4)

        # 1. encoder
        feats = masks_f[..., None].astype(jnp.float32)
        feats_list = self.encoder(feats, pyramid, norm_clouds=2, spmd_axis=spmd_axis)

        # 2. global descriptors from pre-transformer stage-4 features
        # (reference `LCRNet.py:115-122,300-305`)
        if with_global_head:
            desc = self.netvlad(l2_normalize(feats_list[3], axis=-1), masks_c)
            desc = l2_normalize(desc, axis=-1)
            out["ref_feature_global"] = desc[0] if squeeze else desc[0::2]
            out["src_feature_global"] = desc[1] if squeeze else desc[1::2]

        # 3. transformer over stage-4 nodes (pair-aware cross attention)
        enhanced, theta = self.transformer(points_c, feats_list[3], masks_c, return_theta=True)
        out["theta"] = theta
        feats_list = feats_list[:3] + [enhanced]

        # 4. vote encoder -> NMS'd node set + stage-5 features
        vote = self.vote_encoder(enhanced, points_c, masks_c, norm_clouds=2)
        out["shifted_points"] = vote.shifted_points
        out["nodes"] = vote.nodes
        out["node_masks"] = vote.node_masks
        out["node_feats"] = vote.node_feats

        # 4.1 node overlap score (reference `LCRNet_Matching.py:144-148`)
        score = nn.sigmoid(self.node_score_head(vote.node_feats)[..., 0])
        score = jnp.where(vote.node_masks, score, 0.0)
        out["node_scores"] = score

        # 5. point-to-node partition per cloud
        _, occupied, knn_idx, knn_masks = jax.vmap(
            lambda p, n, pm, nm: point_to_node_partition(
                p, n, pm, nm, c.model.num_points_in_patch
            )
        )(points_f, vote.nodes, masks_f, vote.node_masks)
        node_occupied = jnp.logical_and(occupied, vote.node_masks)
        knn_points = batched_gather(points_f, knn_idx, knn_masks, fill=1.0e6)

        # split the pair-major cloud axis: ref side 0::2, src side 1::2
        r_nodes, s_nodes = vote.nodes[0::2], vote.nodes[1::2]
        r_occ, s_occ = node_occupied[0::2], node_occupied[1::2]
        r_knn_pts, s_knn_pts = knn_points[0::2], knn_points[1::2]
        r_knn_idx, s_knn_idx = knn_idx[0::2], knn_idx[1::2]
        r_knn_m, s_knn_m = knn_masks[0::2], knn_masks[1::2]
        r_feats, s_feats = vote.node_feats[0::2], vote.node_feats[1::2]

        # 6. GT node correspondences (training/eval with GT)
        gt_corr = None
        if transforms is not None:
            gt_corr = jax.vmap(
                lambda rn, sn, rkp, skp, t, ro, so, rkm, skm: get_node_correspondences(
                    rn, sn, rkp, skp, t,
                    c.model.ground_truth_matching_radius,
                    ro, so, rkm, skm,
                    capacity=4 * c.shapes.max_nodes,
                )
            )(r_nodes, s_nodes, r_knn_pts, s_knn_pts, transforms, r_occ, s_occ, r_knn_m, s_knn_m)
            out["gt_node_corr"] = jax.tree.map(lambda x: x[0], gt_corr) if squeeze else gt_corr

        # 7. node optimal transport (batched over pairs)
        node_scores_mat = jnp.einsum(
            "pmc,pnc->pmn", r_feats, s_feats
        ) / r_feats.shape[-1] ** 0.5
        node_matching_scores = log_optimal_transport(
            node_scores_mat,
            self.node_ot_alpha,
            r_occ,
            s_occ,
            c.model.num_sinkhorn_iterations,
            fused=not training,  # VMEM-fused kernel on the inference path
        )
        out["node_matching_scores"] = node_matching_scores[0] if squeeze else node_matching_scores
        out["node_occupied"] = node_occupied

        # 8. coarse correspondences
        if training:
            assert gt_corr is not None and p_pairs == 1
            key = self.make_rng("sampling")
            targets = sample_targets(
                jax.tree.map(lambda x: x[0], gt_corr),
                c.coarse_matching.overlap_threshold,
                c.coarse_matching.num_targets,
                key,
            )
            node_corr_ref = targets.ref_indices[None]
            node_corr_src = targets.src_indices[None]
            node_corr_scores = targets.overlaps[None]
            node_corr_valid = targets.valid[None]
        else:
            ncr = jax.vmap(
                lambda s_mat, ro, so: coarse_matching_ot(
                    s_mat, ro, so,
                    capacity=c.shapes.node_corr_limit,
                    num_correspondences=c.coarse_matching.num_correspondences,
                    threshold_sweep=c.coarse_matching.threshold_sweep,
                )
            )(node_matching_scores, r_occ, s_occ)
            node_corr_ref, node_corr_src = ncr.ref_indices, ncr.src_indices
            node_corr_scores, node_corr_valid = ncr.scores, ncr.valid
        out["ref_node_corr_indices"] = node_corr_ref[0] if squeeze else node_corr_ref
        out["src_node_corr_indices"] = node_corr_src[0] if squeeze else node_corr_src
        out["node_corr_scores"] = node_corr_scores[0] if squeeze else node_corr_scores
        out["node_corr_valid"] = node_corr_valid[0] if squeeze else node_corr_valid

        # 9. decoder -> fine features
        feats_f = self.kpdecoder(feats_list, pyramid, norm_clouds=2, spmd_axis=spmd_axis)
        out["feats_f"] = feats_f

        # 10. patch tensors for the correspondence set (per pair)
        def gather_patches(knn_i, knn_mm, knn_pts, feats_one, corr_idx, corr_valid):
            sel_idx = knn_i[corr_idx]                   # (C, K)
            sel_m = jnp.logical_and(knn_mm[corr_idx], corr_valid[:, None])
            sel_pts = knn_pts[corr_idx]
            n = feats_one.shape[0]
            f = feats_one[jnp.clip(sel_idx, 0, n - 1).reshape(-1)].reshape(sel_idx.shape + (feats_one.shape[-1],))
            f = jnp.where(sel_m[..., None], f, 0.0)
            return sel_pts, sel_m, f

        ref_knn_pts, ref_knn_mm, ref_knn_f = jax.vmap(gather_patches)(
            r_knn_idx, r_knn_m, r_knn_pts, feats_f[0::2], node_corr_ref, node_corr_valid
        )
        src_knn_pts, src_knn_mm, src_knn_f = jax.vmap(gather_patches)(
            s_knn_idx, s_knn_m, s_knn_pts, feats_f[1::2], node_corr_src, node_corr_valid
        )
        out["ref_node_corr_knn_points"] = ref_knn_pts[0] if squeeze else ref_knn_pts
        out["src_node_corr_knn_points"] = src_knn_pts[0] if squeeze else src_knn_pts
        out["ref_node_corr_knn_masks"] = ref_knn_mm[0] if squeeze else ref_knn_mm
        out["src_node_corr_knn_masks"] = src_knn_mm[0] if squeeze else src_knn_mm

        # 11. patch optimal transport ((P*C, K, K) in one fused batch)
        pc = ref_knn_f.shape[0] * ref_knn_f.shape[1]
        patch_scores = jnp.einsum(
            "pcnd,pcmd->pcnm", ref_knn_f, src_knn_f
        ) / feats_f.shape[-1] ** 0.5
        k = patch_scores.shape[-1]
        # node_corr_valid is a sorted prefix (coarse_matching_ot returns
        # score-descending top-k), so whole trailing patch blocks are
        # invalid and the fused kernel skips their 100-iteration loops —
        # capacity is worst-case (M+N) while the typical valid count is
        # well under half of it (the single largest op of the forward
        # before this: ~40 ms of ~158 ms)
        matching_scores = log_optimal_transport(
            patch_scores.reshape(pc, k, k),
            self.point_ot_alpha,
            ref_knn_mm.reshape(pc, k),
            src_knn_mm.reshape(pc, k),
            c.model.num_sinkhorn_iterations,
            fused=not training,
            batch_valid=node_corr_valid.reshape(pc),
        ).reshape(ref_knn_f.shape[0], ref_knn_f.shape[1], k + 1, k + 1)
        out["matching_scores"] = matching_scores[0] if squeeze else matching_scores

        # 12. fine matching + LGR (eval path)
        if with_fine_matching:
            fm = jax.vmap(
                lambda rp, sp, rm, sm, ms, nv: fine_matching_lgr(
                    rp, sp, rm, sm,
                    ms if c.fine_matching.use_dustbin else ms[:, :-1, :-1],
                    nv,
                    acceptance_radius=c.fine_matching.acceptance_radius,
                    corr_limit=c.shapes.corr_limit,
                    topk=c.fine_matching.topk,
                    mutual=c.fine_matching.mutual,
                    use_dustbin=c.fine_matching.use_dustbin,
                    confidence_threshold=c.fine_matching.confidence_threshold,
                    correspondence_threshold=c.fine_matching.correspondence_threshold,
                    num_refinement_steps=c.fine_matching.num_refinement_steps,
                )
            )(ref_knn_pts, src_knn_pts, ref_knn_mm, src_knn_mm, matching_scores, node_corr_valid)
            maybe = (lambda x: x[0]) if squeeze else (lambda x: x)
            out["ref_corr_points"] = maybe(fm.ref_corr_points)
            out["src_corr_points"] = maybe(fm.src_corr_points)
            out["corr_scores"] = maybe(fm.corr_scores)
            out["corr_valid"] = maybe(fm.corr_valid)
            out["estimated_transform"] = maybe(fm.estimated_transform)

        return out

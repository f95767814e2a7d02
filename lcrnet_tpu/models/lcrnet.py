"""The LCRNet model family.

Parity targets:
  - `experiments/lcrnet/model_family/LCRNet.py:25-339` (full model:
    keypoint detection + global descriptor + dense matching)
  - `model_family/LCRNet_Matching.py:24-356` (registration training/eval:
    GT node correspondences, overlap score head, target sampling in training)
  - `model_family/LCRNet_GlobalDescrition.py:10-160` (retrieval: encoder +
    NetVLAD descriptor path)

Naming map vs the reference: ref == pos (first cloud), src == anc (second
cloud).  The cloud axis replaces the reference's ragged [pos..., anc...]
stacking.

One flax module covers the whole family: the global head and matching head
are always constructed (stable parameter tree — the reference's
`merge_model.py` checkpoint grafting becomes a trivial subtree copy), and
`describe()` exposes the retrieval-only path over single clouds.
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
    def describe(self, pyramid: Pyramid) -> jnp.ndarray:
        """Retrieval path: (B, N, ...) pyramid -> (B, 256) global descriptors
        (reference `LCRNet_GlobalDescrition.py:66-74`)."""
        feats = pyramid.masks[0][..., None].astype(jnp.float32)
        feats_list = self.encoder(feats, pyramid)
        feats_c = l2_normalize(feats_list[3], axis=-1)
        desc = self.netvlad(feats_c, pyramid.masks[3])
        return l2_normalize(desc, axis=-1)

    # ------------------------------------------------------------------
    def __call__(
        self,
        pyramid: Pyramid,
        transform: Optional[jnp.ndarray] = None,
        training: bool = False,
        with_global_head: bool = True,
        with_fine_matching: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        """Full pair forward.

        Args:
          pyramid: pair pyramid with (2, N_s, ...) tensors (cloud 0 = ref/pos,
            cloud 1 = src/anc).
          transform: (4, 4) GT src->ref transform (required when training).
          training: GT-target path (coarse targets sampled from GT
            correspondences, fine matching skipped unless requested).
        """
        c = self.cfg
        out: Dict[str, jnp.ndarray] = {}

        points_c = pyramid.points[3]
        masks_c = pyramid.masks[3]
        points_f = pyramid.points[0]
        masks_f = pyramid.masks[0]
        out["points_f"] = points_f
        out["masks_f"] = masks_f
        out["ori_points_c"] = points_c
        out["ori_masks_c"] = masks_c

        # 1. encoder
        feats = masks_f[..., None].astype(jnp.float32)
        feats_list = self.encoder(feats, pyramid)

        # 2. global descriptors from pre-transformer stage-4 features
        # (reference `LCRNet.py:115-122,300-305`)
        if with_global_head:
            desc = self.netvlad(l2_normalize(feats_list[3], axis=-1), masks_c)
            desc = l2_normalize(desc, axis=-1)
            out["ref_feature_global"] = desc[0]
            out["src_feature_global"] = desc[1]

        # 3. transformer over stage-4 nodes
        enhanced, theta = self.transformer(points_c, feats_list[3], masks_c, return_theta=True)
        out["theta"] = theta
        feats_list = feats_list[:3] + [enhanced]

        # 4. vote encoder -> NMS'd node set + stage-5 features
        vote = self.vote_encoder(enhanced, points_c, masks_c)
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

        # 6. GT node correspondences (training/eval with GT)
        gt_corr = None
        if transform is not None:
            gt_corr = get_node_correspondences(
                vote.nodes[0],
                vote.nodes[1],
                knn_points[0],
                knn_points[1],
                transform,
                c.model.ground_truth_matching_radius,
                node_occupied[0],
                node_occupied[1],
                knn_masks[0],
                knn_masks[1],
                capacity=4 * c.shapes.max_nodes,
            )
            out["gt_node_corr"] = gt_corr

        # 7. node optimal transport
        node_scores_mat = (
            vote.node_feats[0] @ vote.node_feats[1].T / vote.node_feats.shape[-1] ** 0.5
        )
        node_matching_scores = log_optimal_transport(
            node_scores_mat[None],
            self.node_ot_alpha,
            node_occupied[0][None],
            node_occupied[1][None],
            c.model.num_sinkhorn_iterations,
            fused=not training,  # VMEM-fused kernel on the inference path
        )[0]
        out["node_matching_scores"] = node_matching_scores
        out["node_occupied"] = node_occupied

        # 8. coarse correspondences
        if training:
            assert gt_corr is not None
            key = self.make_rng("sampling")
            targets = sample_targets(
                gt_corr, c.coarse_matching.overlap_threshold, c.coarse_matching.num_targets, key
            )
            node_corr_ref = targets.ref_indices
            node_corr_src = targets.src_indices
            node_corr_scores = targets.overlaps
            node_corr_valid = targets.valid
        else:
            ncr = coarse_matching_ot(
                node_matching_scores,
                node_occupied[0],
                node_occupied[1],
                capacity=c.shapes.node_corr_limit,
                num_correspondences=c.coarse_matching.num_correspondences,
            )
            node_corr_ref, node_corr_src = ncr.ref_indices, ncr.src_indices
            node_corr_scores, node_corr_valid = ncr.scores, ncr.valid
        out["ref_node_corr_indices"] = node_corr_ref
        out["src_node_corr_indices"] = node_corr_src
        out["node_corr_scores"] = node_corr_scores
        out["node_corr_valid"] = node_corr_valid

        # 9. decoder -> fine features
        feats_f = self.kpdecoder(feats_list, pyramid)
        out["feats_f"] = feats_f

        # 10. patch tensors for the correspondence set
        ref_knn_idx = knn_idx[0][node_corr_ref]       # (C, K)
        src_knn_idx = knn_idx[1][node_corr_src]
        ref_knn_m = jnp.logical_and(knn_masks[0][node_corr_ref], node_corr_valid[:, None])
        src_knn_m = jnp.logical_and(knn_masks[1][node_corr_src], node_corr_valid[:, None])
        ref_knn_pts = knn_points[0][node_corr_ref]
        src_knn_pts = knn_points[1][node_corr_src]

        def gather_feats(f, idx, m):
            n = f.shape[0]
            return jnp.where(
                m[..., None], f[jnp.clip(idx, 0, n - 1).reshape(-1)].reshape(idx.shape + (f.shape[-1],)), 0.0
            )

        ref_knn_feats = gather_feats(feats_f[0], ref_knn_idx, ref_knn_m)
        src_knn_feats = gather_feats(feats_f[1], src_knn_idx, src_knn_m)
        out["ref_node_corr_knn_points"] = ref_knn_pts
        out["src_node_corr_knn_points"] = src_knn_pts
        out["ref_node_corr_knn_masks"] = ref_knn_m
        out["src_node_corr_knn_masks"] = src_knn_m

        # 11. patch optimal transport
        patch_scores = jnp.einsum(
            "pnc,pmc->pnm", ref_knn_feats, src_knn_feats
        ) / feats_f.shape[-1] ** 0.5
        matching_scores = log_optimal_transport(
            patch_scores,
            self.point_ot_alpha,
            ref_knn_m,
            src_knn_m,
            c.model.num_sinkhorn_iterations,
            fused=not training,
        )
        out["matching_scores"] = matching_scores

        # 12. fine matching + LGR (eval path)
        if with_fine_matching:
            fm = fine_matching_lgr(
                ref_knn_pts,
                src_knn_pts,
                ref_knn_m,
                src_knn_m,
                matching_scores if c.fine_matching.use_dustbin else matching_scores[:, :-1, :-1],
                node_corr_valid,
                acceptance_radius=c.fine_matching.acceptance_radius,
                corr_limit=c.shapes.corr_limit,
                mutual=c.fine_matching.mutual,
                use_dustbin=c.fine_matching.use_dustbin,
                confidence_threshold=c.fine_matching.confidence_threshold,
                correspondence_threshold=c.fine_matching.correspondence_threshold,
                num_refinement_steps=c.fine_matching.num_refinement_steps,
            )
            out["ref_corr_points"] = fm.ref_corr_points
            out["src_corr_points"] = fm.src_corr_points
            out["corr_scores"] = fm.corr_scores
            out["corr_valid"] = fm.corr_valid
            out["estimated_transform"] = fm.estimated_transform

        return out

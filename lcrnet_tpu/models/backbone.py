"""KPConv backbone: 4-stage encoder, vote encoder (stage 5), 3-stage decoder.

Parity target: `experiments/lcrnet/backbone4.py:11-373`.

TPU inversions vs the reference:
  * The reference's Vote_Encoder round-trips to the CPU three times per
    forward for nanoflann radius searches (`backbone4.py:149-206`) and runs a
    Python O(M^2) greedy NMS loop (`modules/vote/vote.py:6-70`).  Here the
    NMS is the device-resident parallel greedy (`ops/nms.py`) and the radius
    searches are the on-device blocked kernels (`ops/radius_search.py`) — the
    whole forward is one XLA computation.
  * Ragged [pos..., anc...] stacking + lengths becomes a (2, N, ...) cloud
    axis with masks; kept nodes are compacted into a static node budget.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from lcrnet_tpu.models.kpconv import (
    ConvBlock,
    LastUnaryBlock,
    ResidualBlock,
    UnaryBlock,
    batched_gather,
    nearest_upsample,
)
from lcrnet_tpu.models.vote import VoteLayer
from lcrnet_tpu.ops.nms import compact_by_mask, greedy_radius_nms
from lcrnet_tpu.ops.radius_search import radius_search_batched
from lcrnet_tpu.ops.pyramid import Pyramid


class KPEncoder(nn.Module):
    """4-stage KPConv encoder (reference `backbone4.py:11-89`)."""

    input_dim: int
    init_dim: int
    kernel_size: int
    init_radius: float
    init_sigma: float
    group_norm: int
    # LCRNet feeds the mask column as the input feature (reference feeds
    # constant ones, `backbone4.py:60`); the first conv then skips its
    # neighbor-feature gather (see KPConv.ones_features)
    ones_features: bool = False

    @nn.compact
    def __call__(self, feats, pyramid: Pyramid, norm_clouds: int = 2,
                 spmd_axis=None):
        """feats (B, N0, input_dim); pyramid holds per-stage (B, N_s, ...).
        norm_clouds: GroupNorm statistic grouping (2 = per pair, matching the
        reference's pair-stacked norm; 1 = per cloud for descriptor batches).

        spmd_axis: inside shard_map, the mesh axis name for point-axis (mp)
        sharding.  Stages 0 and 1 (97% of the point rows) compute on local
        query shards with ring-halo support slabs (parallel/halo.py — valid
        because the canonical x-sorted tables are banded); stages 2 and 3 are
        replicated after one ~5 MB support all-gather at the 1->2 strided
        transition.  The returned feats_list is then [shard, shard, full,
        full].  Parameter tree and math are identical to the plain path.
        """
        d, ks, r, sg, gn = self.init_dim, self.kernel_size, self.init_radius, self.init_sigma, self.group_norm
        p, m = pyramid.points, pyramid.masks
        nb, nbm = pyramid.neighbors, pyramid.neighbor_masks
        sub, subm = pyramid.subsampling, pyramid.subsampling_masks

        if spmd_axis is not None:
            from lcrnet_tpu.parallel.halo import (
                remap_to_slab, shard_slice, slab_slice,
            )

            # local/slab views for the sharded stages (0 and 1); stage-2/3
            # tables stay replicated.  All of this is slicing of replicated
            # arrays — zero communication.
            def ring_view(q_stage, s_stage, idx, valid):
                l_s = p[s_stage].shape[1] // jax.lax.axis_size(spmd_axis)
                idx_l = shard_slice(idx, spmd_axis)
                val_l = shard_slice(valid, spmd_axis)
                idx_l, val_l = remap_to_slab(idx_l, val_l, l_s, spmd_axis)
                return dict(
                    qp=shard_slice(p[q_stage], spmd_axis),
                    qm=shard_slice(m[q_stage], spmd_axis),
                    sp=slab_slice(p[s_stage], spmd_axis),
                    sm=slab_slice(m[s_stage], spmd_axis, fill=False),
                    idx=idx_l, val=val_l,
                )

            v_self0 = ring_view(0, 0, nb[0], nbm[0])
            v_sub0 = ring_view(1, 0, sub[0], subm[0])
            v_self1 = ring_view(1, 1, nb[1], nbm[1])
            ring0 = ring1 = ("ring", spmd_axis)
            gather1 = ("gather", spmd_axis)
            m1_local = shard_slice(m[1], spmd_axis)
            feats_in = shard_slice(feats, spmd_axis)
        else:
            full = lambda q_stage, s_stage, idx, valid: dict(
                qp=p[q_stage], qm=m[q_stage], sp=p[s_stage], sm=m[s_stage],
                idx=idx, val=valid,
            )
            v_self0 = full(0, 0, nb[0], nbm[0])
            v_sub0 = full(1, 0, sub[0], subm[0])
            v_self1 = full(1, 1, nb[1], nbm[1])
            ring0 = ring1 = gather1 = None
            m1_local = m[1]
            feats_in = feats

        def sargs(view):
            return (view["qp"], view["sp"], view["idx"], view["val"])

        # Kernel-influence reuse: the FIRST conv on each self table computes
        # the (M, K, H) influence tensor inline (the coordinate rows ride
        # its fused gather) and returns it; the second conv on the same
        # table consumes it.  This replaced the standalone kpconv_influence
        # hoist maps, whose separate (M, H)-row coordinate gathers cost
        # ~11 ms/forward of pure address-generation (round-5 trace).
        feats_list = []
        x, infl0 = ConvBlock(self.input_dim, d, ks, r, sg, gn, ones_features=self.ones_features)(
            feats_in, *sargs(v_self0), v_self0["qm"], norm_clouds,
            spmd_axis=spmd_axis, return_influence=True)
        x = ResidualBlock(d, d * 2, ks, r, sg, gn)(
            x, *sargs(v_self0), v_self0["qm"], v_self0["qm"], norm_clouds,
            influence=infl0, spmd=ring0)
        feats_list.append(x)

        x = ResidualBlock(d * 2, d * 2, ks, r, sg, gn, strided=True)(
            x, *sargs(v_sub0), v_sub0["qm"], v_self0["qm"], norm_clouds, spmd=ring0)
        x, infl1 = ResidualBlock(d * 2, d * 4, ks, r * 2, sg * 2, gn)(
            x, *sargs(v_self1), v_self1["qm"], v_self1["qm"], norm_clouds,
            spmd=ring1, return_influence=True)
        x = ResidualBlock(d * 4, d * 4, ks, r * 2, sg * 2, gn)(
            x, *sargs(v_self1), v_self1["qm"], v_self1["qm"], norm_clouds,
            influence=infl1, spmd=ring1)
        feats_list.append(x)

        # 1 -> 2 strided transition: queries (stage 2+) are replicated from
        # here on; the block all-gathers its bottleneck support features
        x = ResidualBlock(d * 4, d * 4, ks, r * 2, sg * 2, gn, strided=True)(
            x, p[2], p[1], sub[1], subm[1], m[2], m1_local, norm_clouds, spmd=gather1)
        x, infl2 = ResidualBlock(d * 4, d * 8, ks, r * 4, sg * 4, gn)(
            x, p[2], p[2], nb[2], nbm[2], m[2], m[2], norm_clouds, return_influence=True)
        x = ResidualBlock(d * 8, d * 8, ks, r * 4, sg * 4, gn)(x, p[2], p[2], nb[2], nbm[2], m[2], m[2], norm_clouds, influence=infl2)
        feats_list.append(x)

        x = ResidualBlock(d * 8, d * 8, ks, r * 4, sg * 4, gn, strided=True)(x, p[3], p[2], sub[2], subm[2], m[3], m[2], norm_clouds)
        x, infl3 = ResidualBlock(d * 8, d * 16, ks, r * 8, sg * 8, gn)(
            x, p[3], p[3], nb[3], nbm[3], m[3], m[3], norm_clouds, return_influence=True)
        x = ResidualBlock(d * 16, d * 16, ks, r * 8, sg * 8, gn)(x, p[3], p[3], nb[3], nbm[3], m[3], m[3], norm_clouds, influence=infl3)
        feats_list.append(x)

        return feats_list


class VoteResult(NamedTuple):
    shifted_points: jnp.ndarray   # (B, N4, 3) all shifted stage-4 nodes
    nodes: jnp.ndarray            # (B, M_c, 3) NMS'd + neighbor-averaged centers
    node_masks: jnp.ndarray       # (B, M_c)
    node_feats: jnp.ndarray       # (B, M_c, C) stage-5 features


class VoteEncoder(nn.Module):
    """Vote -> NMS -> center averaging -> stage-5 convs
    (reference `backbone4.py:92-220`)."""

    init_dim: int
    kernel_size: int
    init_radius: float
    init_sigma: float
    group_norm: int
    nms_radius: float
    max_translate_range: float
    input_feats_dim: int
    max_nodes: int
    vote_neighbor_limit: int
    sub_neighbor_limit: int
    self_neighbor_limit: int

    @nn.compact
    def __call__(self, feats_c, points_c, masks_c, norm_clouds: int = 2) -> VoteResult:
        """feats_c (B, N4, 256) post-transformer; points_c (B, N4, 3)."""
        shifted = VoteLayer(self.input_feats_dim, self.max_translate_range)(
            points_c, feats_c
        )
        shifted = jnp.where(masks_c[..., None], shifted, 1.0e6)

        # greedy NMS + compaction into the static node budget, per cloud
        keep = jax.vmap(lambda p, m: greedy_radius_nms(p, m, self.nms_radius))(
            shifted, masks_c
        )
        nodes, node_masks, _ = jax.vmap(
            lambda v, k: compact_by_mask(v, k, self.max_nodes, pad_value=1.0e6)
        )(shifted, keep)

        # average shifted points within nms_radius of each kept node
        # (reference `backbone4.py:149-178`, on-device instead of .cpu())
        idx, val = radius_search_batched(
            nodes, shifted, node_masks, masks_c, self.nms_radius, self.vote_neighbor_limit
        )
        nb_pts = batched_gather(shifted, idx, val)
        counts = jnp.maximum(jnp.sum(val.astype(jnp.float32), axis=-1), 1.0)
        centers = jnp.sum(nb_pts, axis=-2) / counts[..., None]
        centers = jnp.where(node_masks[..., None], centers, 1.0e6)

        # stage-5 convolutions onto the voted centers
        # (reference `backbone4.py:180-214`: radius*8 strided onto centers,
        # then two self blocks at radius*16)
        d, ks, gn = self.init_dim, self.kernel_size, self.group_norm
        r, sg = self.init_radius, self.init_sigma
        sub_idx, sub_val = radius_search_batched(
            centers, points_c, node_masks, masks_c, r * 8, self.sub_neighbor_limit
        )
        self_idx, self_val = radius_search_batched(
            centers, centers, node_masks, node_masks, r * 16, self.self_neighbor_limit
        )

        x = ResidualBlock(d * 4, d * 4, ks, r * 8, sg * 8, gn, strided=True)(
            feats_c, centers, points_c, sub_idx, sub_val, node_masks, masks_c, norm_clouds
        )
        x, self_infl = ResidualBlock(d * 4, d * 8, ks, r * 16, sg * 16, gn)(
            x, centers, centers, self_idx, self_val, node_masks, node_masks, norm_clouds,
            return_influence=True
        )
        x = ResidualBlock(d * 8, d * 8, ks, r * 16, sg * 16, gn)(
            x, centers, centers, self_idx, self_val, node_masks, node_masks, norm_clouds,
            influence=self_infl
        )

        return VoteResult(
            shifted_points=shifted,
            nodes=centers,
            node_masks=node_masks,
            node_feats=x,
        )


class KPDecoder(nn.Module):
    """3-stage decoder with skip connections (reference `backbone4.py:333-373`).

    Stage-4 features must be the (B, N4, 256) transformer-enhanced features —
    the reference overwrites feats_list[-1] before decoding (`LCRNet.py:154`).
    """

    init_dim: int
    group_norm: int

    @nn.compact
    def __call__(self, feats_list, pyramid: Pyramid, norm_clouds: int = 2,
                 spmd_axis=None):
        """spmd_axis: point-axis sharding inside shard_map.  feats_list is
        the encoder's [shard, shard, full, full] layout; stages mirror the
        encoder — the stage-2 unary is replicated, stages 1 and 0 compute on
        local query shards (the up-tables are limit-1 banded, so the stage-0
        gather needs only the ring slab of the stage-1 latent).  The final
        fine features are all-gathered before returning, because fine
        matching gathers per-node patches that span shards."""
        d, gn = self.init_dim, self.group_norm
        up, upm = pyramid.upsampling, pyramid.upsampling_masks
        m = pyramid.masks

        latent = nearest_upsample(feats_list[3], up[2], upm[2])
        latent = jnp.concatenate([latent, feats_list[2]], axis=-1)
        latent = UnaryBlock(d * 12, d * 8, gn)(latent, m[2], norm_clouds)

        if spmd_axis is not None:
            from lcrnet_tpu.parallel.halo import (
                all_gather_rows, remap_to_slab, ring_exchange, shard_slice,
            )

            # stage 1: local queries gather from the REPLICATED stage-2
            # latent (global indices, no remap)
            up1 = shard_slice(up[1], spmd_axis)
            upm1 = shard_slice(upm[1], spmd_axis)
            latent = nearest_upsample(latent, up1, upm1)
            latent = jnp.concatenate([latent, feats_list[1]], axis=-1)
            latent = UnaryBlock(d * 12, d * 4, gn)(
                latent, shard_slice(m[1], spmd_axis), norm_clouds, spmd_axis)

            # stage 0: local queries gather from the SHARDED stage-1 latent
            # via its ring slab
            l1 = m[1].shape[1] // jax.lax.axis_size(spmd_axis)
            up0 = shard_slice(up[0], spmd_axis)
            upm0 = shard_slice(upm[0], spmd_axis)
            up0, upm0 = remap_to_slab(up0, upm0, l1, spmd_axis)
            latent = nearest_upsample(ring_exchange(latent, spmd_axis), up0, upm0)
            latent = jnp.concatenate([latent, feats_list[0]], axis=-1)
            latent = LastUnaryBlock(d * 2)(latent)
            return all_gather_rows(latent, spmd_axis)

        latent = nearest_upsample(latent, up[1], upm[1])
        latent = jnp.concatenate([latent, feats_list[1]], axis=-1)
        latent = UnaryBlock(d * 12, d * 4, gn)(latent, m[1], norm_clouds)

        latent = nearest_upsample(latent, up[0], upm[0])
        latent = jnp.concatenate([latent, feats_list[0]], axis=-1)
        latent = LastUnaryBlock(d * 2)(latent)
        return latent

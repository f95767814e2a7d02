"""Kernel Point Convolution and building blocks, flax + TPU-native.

Parity targets:
  - `experiments/lcrnet/modules/kpconv/kpconv.py:79-122` (KPConv forward:
    gather neighbors, linear-correlation kernel weights clamp(1-d/sigma, 0),
    per-kernel matmul, normalize by valid-neighbor count, optional bias)
  - `modules/kpconv/modules.py:33-225` (GroupNorm wrapper, UnaryBlock,
    ConvBlock, ResidualBlock with strided maxpool shortcut)
  - `modules/kpconv/functional.py:6-91` (nearest_upsample, maxpool)

TPU design choices:
  * All tensors are dense padded (B, N, C) with (B, N) masks; B is the cloud
    axis (2 for a registration pair).  Neighbor tables are per-cloud indices.
  * The (M, H, K) kernel-influence tensor is never materialized at full M:
    queries are processed in static blocks via lax.map, and the per-kernel
    contraction is restructured as one (block, K*C_in) @ (K*C_in, C_out) MXU
    matmul instead of K separate matmuls.
  * The kernel-point distance term uses the |n|^2 - 2 n.k + |k|^2 expansion so
    the (block, H, K) cross term is a single small matmul.
  * GroupNorm statistics are computed over *valid rows only* — the padded
    layout would otherwise corrupt them (the reference's ragged stacking has
    no padding so plain GroupNorm suffices there).  Statistics span the whole
    (B, N) extent jointly, matching the reference's pair-stacked GroupNorm.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from lcrnet_tpu.models.kernel_points import load_kernel_points

_PAD_OFFSET = 1.0e6


def _influence_dtype():
    """Storage dtype for influence tensors streamed between conv blocks:
    bf16 on TPU (the consuming matmul's default-precision input rounding is
    bf16 regardless), f32 elsewhere (CPU matmuls are true f32 and the
    golden tests pin bit-stability there)."""
    return jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32


def _map_blocks(f, xs):
    """lax.map, unrolled on TPU.

    The conv processes queries as (b*nb) independent blocks.  As a lax.map
    (scan), every iteration pays a dynamic-slice COPY of its operand rows
    out of the stacked input (profiler r05: ~0.06 ms x 186 iterations
    ~= 11 ms/forward attributed to `copy` ops at the map site).  Unrolling
    turns those into static slices that fuse into the block body (no copy);
    the block count is static and small (4-10 per conv), so program size
    stays bounded.  CPU keeps lax.map: compile time dominates there
    (tests), and the golden tests pin CPU bit-stability.
    Override with LCRNET_UNROLL_CONV_MAP=0/1."""
    import os

    v = os.environ.get("LCRNET_UNROLL_CONV_MAP")
    unroll = (v not in ("0", "", "false")) if v is not None \
        else jax.default_backend() == "tpu"
    if not unroll:
        return lax.map(f, xs)
    n = jax.tree_util.tree_leaves(xs)[0].shape[0]
    ys = [f(jax.tree.map(lambda x, i=i: x[i], xs)) for i in range(n)]
    return jax.tree.map(lambda *zs: jnp.stack(zs), *ys)


def _kaiming_uniform(key, shape, dtype=jnp.float32):
    """Kaiming-uniform over fan_in = prod(shape[:-1]) (K*C_in for KPConv)."""
    fan_in = 1
    for s in shape[:-1]:
        fan_in *= s
    bound = jnp.sqrt(6.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def batched_gather(data: jnp.ndarray, idx: jnp.ndarray, valid: jnp.ndarray,
                   fill: float = 0.0) -> jnp.ndarray:
    """Gather (B, N, C) rows at (B, ...) indices -> (B, ..., C), masked."""
    b, n = data.shape[:2]
    flat_idx = jnp.clip(idx, 0, n - 1).reshape(b, -1)
    out = jnp.take_along_axis(data, flat_idx[..., None], axis=1)
    out = out.reshape(idx.shape + (data.shape[-1],))
    return jnp.where(valid[..., None], out, fill)


def _pad_table_width(idx: jnp.ndarray, valid: jnp.ndarray, mult: int = 8):
    """Pad a neighbor table's width to a multiple of the f32 sublane tile.

    The conv's fused gather emits (block*h, C) rows and reshapes to
    (block, h, C); when h is a multiple of 8 the tiled layouts coincide and
    the reshape is a free bitcast, while h = 68 (the calibrated stage-0/2
    limit) forces a physical relayout copy of the 128-lane-padded gather
    output — measured ~20 ms/forward across the conv stack.  Padded columns
    are invalid (masked), so the math is unchanged: truncation semantics
    still follow the calibrated limit, the extra columns contribute zero.
    """
    h = idx.shape[-1]
    pad = (-h) % mult
    if pad == 0:
        return idx, valid
    widths = ((0, 0),) * (idx.ndim - 1) + ((0, pad),)
    return jnp.pad(idx, widths), jnp.pad(valid, widths)


def kpconv_influence(
    q_points: jnp.ndarray,
    s_points: jnp.ndarray,
    neighbor_indices: jnp.ndarray,
    neighbor_masks: jnp.ndarray,
    kp: jnp.ndarray,
    sigma: float,
    query_block: int = 4096,
) -> jnp.ndarray:
    """Kernel-influence tensor clamp(1 - d/sigma, 0) for a neighbor table.

    (B, M, H) table -> (B, M, K, H) f32.  Two conv blocks that share the
    same (queries, supports, table, radius, sigma) recompute this tensor —
    including the scattered coordinate gather — identically; hoisting it
    once per table and passing it via `KPConv.__call__(influence=...)`
    trades ~0.5 GB/pair of sequential HBM traffic for the repeated gather
    passes (measured win at KITTI scale).  Bit-identical math to the
    in-conv computation.

    Layout note: the trailing two dims are (K, H), NOT (H, K).  The VPU
    pads the lane (last) dim to 128: with K = 15 kernel points in lanes the
    elementwise influence math (sqrt/clamp/max) padded 15 -> 128 (8.5x
    wasted lanes); with H = 64-96 neighbors in lanes it pads ~1.3-1.9x, and
    the conv's (K, H) x (H, C) contraction consumes this layout directly
    (the old layout swapaxed right before the matmul anyway)."""
    neighbor_indices, neighbor_masks = _pad_table_width(
        neighbor_indices, neighbor_masks)
    b, m, h = neighbor_indices.shape
    n = s_points.shape[1]
    k = kp.shape[0]
    kp_sq = jnp.sum(kp * kp, axis=-1)

    block = min(query_block, m)
    pad = (-m) % block
    nb = (m + pad) // block
    qp = jnp.pad(q_points, ((0, 0), (0, pad), (0, 0))).reshape(b * nb, block, 3)
    idx = jnp.pad(neighbor_indices, ((0, 0), (0, pad), (0, 0))).reshape(b * nb, block, h)
    msk = jnp.pad(neighbor_masks, ((0, 0), (0, pad), (0, 0))).reshape(b * nb, block, h)
    cloud_of_block = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nb)

    def one_block(args):
        bqp, bidx, bmsk, cid = args
        sp = lax.dynamic_index_in_dim(s_points, cid, axis=0, keepdims=False)
        ci = jnp.clip(bidx, 0, n - 1)
        nb_pts = sp[ci.reshape(-1)].reshape(block, h, 3)
        rel = nb_pts - bqp[:, None, :]
        rel = jnp.where(bmsk[..., None], rel, _PAD_OFFSET)
        # (K, 3) x (block, H, 3) -> (block, K, H): H rides the lanes
        cross = jnp.einsum(
            "kd,bhd->bkh", kp, rel,
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
        rel_sq = jnp.sum(rel * rel, axis=-1)                   # (block, H)
        d2 = jnp.maximum(
            rel_sq[:, None, :] - 2.0 * cross + kp_sq[None, :, None], 1e-12
        )
        return jnp.maximum(1.0 - jnp.sqrt(d2) / sigma, 0.0)    # (block, K, H)

    infl = _map_blocks(one_block, (qp, idx, msk, cloud_of_block))
    return infl.reshape(b, nb * block, k, h)[:, :m]


class KPConv(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    use_bias: bool = True
    # 4096 measured best: 8192 halves the lax.map iteration count but the
    # forward regressed 105.3 -> 108.1 ms (bigger blocks pipeline worse)
    query_block: int = 4096
    # the first backbone conv consumes the mask-as-feature ones column
    # (reference feeds a constant-1 feature, `backbone4.py:60`): the neighbor
    # feature gather then equals the neighbor mask, so it can be skipped
    # entirely — sum the kernel influences instead.  Measured 20 ms/forward:
    # a 1-channel scattered gather is element-granular, the slowest access
    # pattern on TPU.  Exact same math (influences are already zero at
    # masked neighbors via the PAD offset).
    ones_features: bool = False

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices, neighbor_masks,
                 influence=None, aux_maxpool=None, return_influence=False):
        """KPConv over padded batched clouds.

        Args:
          s_feats: (B, N, C_in) support features.
          q_points: (B, M, 3); s_points: (B, N, 3).
          neighbor_indices: (B, M, H) per-cloud support indices.
          neighbor_masks: (B, M, H) validity.
          influence: optional precomputed (B, M, K, H) kernel-influence
            tensor for THIS table/radius/sigma — skips the per-conv
            coordinate gather + influence math.  Produced by a prior conv
            on the same table via `return_influence=True` (the coordinate
            rows ride that conv's fused gather for free) or by
            `kpconv_influence`.
          aux_maxpool: optional (B, N, C_aux) support features to max-pool
            over the SAME neighbor table (the strided ResidualBlock's
            shortcut `maxpool`).  Scattered row gathers on TPU are
            address-generation-bound, not byte-bound, so widening the
            conv's gather row by C_aux lanes is nearly free while a
            separate maxpool gather pays a full (M*H)-row address pass.
          return_influence: also return the inline-computed influence
            tensor so the NEXT conv on the same table can reuse it
            (requires influence=None).

        Returns: (B, M, C_out), extended to (out, aux_pooled (B, M, C_aux))
        when aux_maxpool is given and/or (..., influence) when
        return_influence is set.
        """
        kp = jnp.asarray(load_kernel_points(self.radius, self.kernel_size))  # (K, 3)
        weights = self.param(
            "weights",
            _kaiming_uniform,
            (self.kernel_size, self.in_channels, self.out_channels),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.out_channels,))
            if self.use_bias
            else None
        )

        if self.ones_features:
            assert self.in_channels == 1, "ones_features requires C_in == 1"
        assert not (return_influence and influence is not None)
        neighbor_indices, neighbor_masks = _pad_table_width(
            neighbor_indices, neighbor_masks)
        if influence is not None and influence.shape[-1] != neighbor_indices.shape[-1]:
            influence = jnp.pad(
                influence,
                ((0, 0), (0, 0), (0, 0),
                 (0, neighbor_indices.shape[-1] - influence.shape[-1])),
            )
        b, m, h = neighbor_indices.shape
        n = s_points.shape[1]
        k = self.kernel_size
        c_in, c_out = self.in_channels, self.out_channels
        w_flat = weights.reshape(k * c_in, c_out)
        kp_sq = jnp.sum(kp * kp, axis=-1)  # (K,)

        block = min(self.query_block, m)
        pad = (-m) % block
        nb = (m + pad) // block

        # flatten clouds x query-blocks into ONE map; the per-block support
        # cloud is selected by dynamic index (vmapping a per-cloud lax.map
        # compiles to a much slower program on TPU)
        qp = jnp.pad(q_points, ((0, 0), (0, pad), (0, 0))).reshape(b * nb, block, 3)
        idx = jnp.pad(neighbor_indices, ((0, 0), (0, pad), (0, 0))).reshape(b * nb, block, h)
        msk = jnp.pad(neighbor_masks, ((0, 0), (0, pad), (0, 0))).reshape(b * nb, block, h)
        cloud_of_block = jnp.repeat(jnp.arange(b, dtype=jnp.int32), nb)
        pre_infl = None
        if influence is not None:
            pre_infl = jnp.pad(
                influence, ((0, 0), (0, pad), (0, 0), (0, 0))
            ).reshape(b * nb, block, k, h)

        # ONE fused gather source per block: conv features | shortcut-maxpool
        # features | support coordinates share the same row addresses, and TPU
        # scattered gathers pay per ROW (address generation), not per byte —
        # concatenating the columns collapses up to three address passes into
        # one slightly wider gather.
        parts = []
        if not self.ones_features:
            parts.append(("feats", s_feats))
        if aux_maxpool is not None:
            parts.append(("aux", aux_maxpool))
        if pre_infl is None:
            parts.append(("pts", s_points))
        gather_src = (
            jnp.concatenate([p for _, p in parts], axis=-1) if len(parts) > 1
            else (parts[0][1] if parts else None)
        )

        def one_block(args):
            if pre_infl is None:
                bqp, bidx, bmsk, cid = args
                infl = None
            else:
                bqp, bidx, bmsk, cid, infl = args
                # bf16-streamed influence: upcast in-register for the f32
                # contraction (the MXU rounds back to bf16 internally)
                infl = infl.astype(jnp.float32)
            ci = jnp.clip(bidx, 0, n - 1)
            nb_feats = nb_aux = nb_pts = None
            if gather_src is not None:
                src = lax.dynamic_index_in_dim(gather_src, cid, axis=0, keepdims=False)
                rows = src[ci.reshape(-1)].reshape(block, h, src.shape[-1])
                off = 0
                for name, p in parts:
                    sl = rows[..., off:off + p.shape[-1]]
                    off += p.shape[-1]
                    if name == "feats":
                        nb_feats = sl
                    elif name == "aux":
                        nb_aux = sl
                    else:
                        nb_pts = sl
            if infl is None:
                rel = nb_pts - bqp[:, None, :]
                rel = jnp.where(bmsk[..., None], rel, _PAD_OFFSET)
                # d^2 to kernel points via expansion -> (block, K, H): H in
                # the lane dim (K = 15 in lanes padded 8.5x on the VPU)
                cross = jnp.einsum(
                    "kd,bhd->bkh", kp, rel,
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST,  # coordinate math: no bf16
                )
                rel_sq = jnp.sum(rel * rel, axis=-1)           # (block, H)
                # clamp at a small positive value: a self-neighbor sits exactly
                # on the center kernel point and sqrt(0) has an infinite
                # gradient (the reference dodges this only via its random
                # kernel-point noise, `kernel_points.py:449`)
                d2 = jnp.maximum(
                    rel_sq[:, None, :] - 2.0 * cross + kp_sq[None, :, None], 1e-12
                )
                infl = jnp.maximum(1.0 - jnp.sqrt(d2) / self.sigma, 0.0)  # (block,K,H)

            if self.ones_features:
                # neighbor features == neighbor mask; infl is already zero at
                # masked neighbors, so the contraction is a plain reduction
                weighted = jnp.sum(infl, axis=2)[..., None]  # (block, K, 1)
            else:
                nb_feats = jnp.where(bmsk[..., None], nb_feats, 0.0)
                # (block, K, H) @ (block, H, C_in) -> (block, K, C_in)
                weighted = lax.dot_general(
                    infl, nb_feats,
                    dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32,
                )
            out = jnp.dot(
                weighted.reshape(block, k * c_in), w_flat,
                preferred_element_type=jnp.float32,
            )
            count = jnp.maximum(jnp.sum(bmsk.astype(jnp.float32), axis=1), 1.0)
            out = out / count[:, None]
            pooled = None
            if nb_aux is not None:
                # masked neighbor max-pool, identical to `maxpool`
                pooled = jnp.max(jnp.where(bmsk[..., None], nb_aux, -1.0e12), axis=1)
                pooled = jnp.where(jnp.any(bmsk, axis=1, keepdims=True), pooled, 0.0)
            if return_influence and infl is not None:
                # TPU: stream the reused influence in bf16 — its only
                # consumer is the (K, H) x (H, C) MXU contraction, whose
                # default-precision input rounding is bf16 anyway, so the
                # halved HBM stream costs no precision the matmul had.
                # CPU keeps f32 (true-f32 matmuls there; goldens bit-stable).
                infl = infl.astype(_influence_dtype())
            return out, pooled, (infl if return_influence else None)

        if pre_infl is None:
            out, pooled, infl_out = _map_blocks(
                one_block, (qp, idx, msk, cloud_of_block))
        else:
            out, pooled, infl_out = _map_blocks(
                one_block, (qp, idx, msk, cloud_of_block, pre_infl))
        out = out.reshape(b, nb * block, c_out)[:, :m]
        if bias is not None:
            out = out + bias
        results = (out,)
        if aux_maxpool is not None:
            results += (pooled.reshape(b, nb * block, -1)[:, :m],)
        if return_influence:
            results += (infl_out.reshape(b, nb * block, k, h)[:, :m],)
        return results if len(results) > 1 else out


class MaskedGroupNorm(nn.Module):
    """GroupNorm over (B, N, C) with statistics from valid rows only.

    `clouds_per_group` controls which clouds share statistics: 2 reproduces
    the reference's pair-stacked GroupNorm (`modules.py:33-52` normalizes the
    whole [ref..., src...] stack jointly); 1 gives independent per-cloud
    statistics (single-scan descriptor extraction — batchmates must not
    couple)."""

    num_groups: int
    num_channels: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, mask, clouds_per_group: int = 1,
                 spmd_axis: Optional[str] = None):
        """spmd_axis: inside shard_map with x holding only this device's
        point-axis shard, the name of the mesh axis to psum statistics over
        (each global row must appear on exactly one device)."""
        scale = self.param("scale", nn.initializers.ones, (self.num_channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_channels,))
        b, n, c = x.shape
        g = self.num_groups
        cg = clouds_per_group
        assert b % cg == 0, (b, cg)
        # SPMD note: never merge the cloud axis into the point axis — a
        # (b, n, c) -> (b/cg, cg*n, ...) reshape mixes a replicated axis
        # with the mp-sharded point axis, and XLA all-gathers the FULL
        # activation per GroupNorm (measured: 20 MB x ~40 sites/step at
        # 20480 points).  Reductions over (n, c/g) keep the point axis
        # intact and lower to local partial sums + a (b, g)-sized
        # all-reduce; only the tiny per-group stats get reshaped.
        xg = x.reshape(b, n, g, c // g)
        m = mask[:, :, None, None].astype(x.dtype)
        s = jnp.sum(xg * m, axis=(1, 3))                       # (b, g)
        cnt = jnp.sum(mask.astype(x.dtype), axis=1)            # (b,)
        if spmd_axis is not None:
            s, cnt = lax.psum((s, cnt), spmd_axis)
        denom = jnp.maximum(
            cnt.reshape(b // cg, cg).sum(axis=1) * (c // g), 1.0
        )[:, None]                                             # (b/cg, 1)
        mean = s.reshape(b // cg, cg, g).sum(axis=1) / denom   # (b/cg, g)
        mean_b = jnp.repeat(mean, cg, axis=0)[:, None, :, None]
        d = (xg - mean_b) * m
        v = jnp.sum(d * d, axis=(1, 3))                        # (b, g)
        if spmd_axis is not None:
            v = lax.psum(v, spmd_axis)
        var = v.reshape(b // cg, cg, g).sum(axis=1) / denom    # (b/cg, g)
        var_b = jnp.repeat(var, cg, axis=0)[:, None, :, None]
        out = (xg - mean_b) * lax.rsqrt(var_b + self.epsilon)
        out = out.reshape(b, n, c) * scale + bias
        return jnp.where(mask[..., None], out, 0.0)


class UnaryBlock(nn.Module):
    """Linear + GroupNorm + LeakyReLU(0.1) (reference `modules.py:55-86`)."""

    in_channels: int
    out_channels: int
    group_norm: int
    has_relu: bool = True

    @nn.compact
    def __call__(self, x, mask, norm_clouds: int = 1,
                 spmd_axis: Optional[str] = None):
        x = nn.Dense(self.out_channels)(x)
        x = MaskedGroupNorm(self.group_norm, self.out_channels)(
            x, mask, norm_clouds, spmd_axis)
        if self.has_relu:
            x = nn.leaky_relu(x, 0.1)
        return x


class LastUnaryBlock(nn.Module):
    """Plain linear head (reference `modules.py:89-103`)."""

    out_channels: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out_channels)(x)


class ConvBlock(nn.Module):
    """KPConv + GroupNorm + LeakyReLU (reference `modules.py:106-151`)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    group_norm: int
    ones_features: bool = False

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices, neighbor_masks, q_mask,
                 norm_clouds: int = 1, influence=None,
                 spmd_axis: Optional[str] = None, return_influence: bool = False):
        """spmd_axis: queries (and hence outputs) hold this device's
        point-axis shard; GroupNorm stats psum over the axis.  The support
        args must already be slab-remapped by the caller (a ones_features
        conv, the only ConvBlock use, gathers no support features at all)."""
        x = KPConv(
            self.in_channels, self.out_channels, self.kernel_size, self.radius, self.sigma,
            ones_features=self.ones_features,
        )(s_feats, q_points, s_points, neighbor_indices, neighbor_masks,
          influence=influence, return_influence=return_influence)
        if return_influence:
            x, infl = x
        x = MaskedGroupNorm(self.group_norm, self.out_channels)(
            x, q_mask, norm_clouds, spmd_axis)
        x = nn.leaky_relu(x, 0.1)
        return (x, infl) if return_influence else x


def maxpool(s_feats, neighbor_indices, neighbor_masks):
    """Masked neighbor max-pool (reference `functional.py:58-71`)."""
    nb = batched_gather(s_feats, neighbor_indices, neighbor_masks, fill=-1.0e12)
    out = jnp.max(nb, axis=-2)
    any_valid = jnp.any(neighbor_masks, axis=-1, keepdims=True)
    return jnp.where(any_valid, out, 0.0)


def nearest_upsample(s_feats, upsample_indices, upsample_masks):
    """First-column gather (reference `functional.py:6-23`)."""
    return batched_gather(s_feats, upsample_indices[..., 0], upsample_masks[..., 0])


def knn_interpolate(s_feats, q_points, s_points, knn_indices, knn_masks, eps=1e-8):
    """Inverse-squared-distance kNN interpolation (reference
    `functional.py:26-55`).  knn_indices/masks: (B, N, k) support lookups."""
    knn_pts = batched_gather(s_points, knn_indices, knn_masks, fill=1.0e6)
    knn_f = batched_gather(s_feats, knn_indices, knn_masks)
    d2 = jnp.sum((q_points[..., None, :] - knn_pts) ** 2, axis=-1)
    w = knn_masks.astype(s_feats.dtype) / (d2 + eps)
    w = w / (jnp.sum(w, axis=-1, keepdims=True) + eps)
    return jnp.sum(knn_f * w[..., None], axis=-2)


class ResidualBlock(nn.Module):
    """Bottleneck residual KPConv block (reference `modules.py:154-225`)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    group_norm: int
    strided: bool = False

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices, neighbor_masks,
                 q_mask, s_mask, norm_clouds: int = 1, influence=None,
                 spmd=None, return_influence: bool = False):
        """spmd: None for the plain path, else ("ring"|"gather", axis_name)
        for point-axis (mp) sharding inside shard_map:

          * "ring": s_feats/s_mask hold this device's LOCAL support rows;
            q_points/q_mask/neighbor_* hold the LOCAL query rows with
            indices already remapped into [left|local|right] slab positions
            (parallel/halo.py).  The conv input features are ring-exchanged
            here — after the bottleneck unary, so the exchange moves `mid`
            channels, and fused with the shortcut features so both ride one
            ppermute pair.  Outputs are the local query shard.
          * "gather": queries are REPLICATED (a coarse stage) while
            supports are sharded — support features are all-gathered here
            (the stage-1 -> stage-2 transition, ~5 MB).  Outputs replicated.
        """
        mode, axis = spmd if spmd is not None else (None, None)
        s_spmd = axis  # supports are sharded in both modes
        q_spmd = axis if mode == "ring" else None
        mid = self.out_channels // 4
        if self.in_channels != mid:
            x = UnaryBlock(self.in_channels, mid, self.group_norm)(
                s_feats, s_mask, norm_clouds, s_spmd)
        else:
            x = s_feats
        conv = KPConv(mid, mid, self.kernel_size, self.radius, self.sigma)
        if mode is not None:
            from lcrnet_tpu.parallel.halo import all_gather_rows, ring_exchange

            exchange = ring_exchange if mode == "ring" else all_gather_rows
            if self.strided:
                # one ppermute pair / all-gather for both the conv input and
                # the shortcut-maxpool features
                both = exchange(jnp.concatenate([x, s_feats], axis=-1), axis)
                x_sup, short_sup = both[..., :mid], both[..., mid:]
            else:
                x_sup, short_sup = exchange(x, axis), None
        else:
            x_sup, short_sup = x, s_feats if self.strided else None
        infl_out = None
        if self.strided:
            # the shortcut maxpool rides the conv's gather (same neighbor
            # rows) instead of paying its own address pass
            x = conv(
                x_sup, q_points, s_points, neighbor_indices, neighbor_masks,
                influence=influence, aux_maxpool=short_sup,
                return_influence=return_influence,
            )
            if return_influence:
                x, shortcut, infl_out = x
            else:
                x, shortcut = x
        else:
            x = conv(x_sup, q_points, s_points, neighbor_indices, neighbor_masks,
                     influence=influence, return_influence=return_influence)
            if return_influence:
                x, infl_out = x
            shortcut = s_feats
        x = MaskedGroupNorm(self.group_norm, mid)(x, q_mask, norm_clouds, q_spmd)
        x = nn.leaky_relu(x, 0.1)
        x = UnaryBlock(mid, self.out_channels, self.group_norm, has_relu=False)(
            x, q_mask, norm_clouds, q_spmd)
        if self.in_channels != self.out_channels:
            shortcut = UnaryBlock(
                self.in_channels, self.out_channels, self.group_norm, has_relu=False
            )(shortcut, q_mask, norm_clouds, q_spmd)
        out = nn.leaky_relu(x + shortcut, 0.1)
        return (out, infl_out) if return_influence else out

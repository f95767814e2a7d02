"""High-level jitted pipelines: pair inference and descriptor extraction.

The whole reference call stack (`demo/demo.py` → collate workers → forward
with CPU hops → CPU SVD) collapses into single jitted device functions here:
raw padded clouds in, descriptors + 6-DoF pose out.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from lcrnet_tpu.config import LCRNetConfig
from lcrnet_tpu.models.lcrnet import LCRNet
from lcrnet_tpu.ops.pyramid import Pyramid, build_pyramid_batched


def build_batch_pyramid(points: jnp.ndarray, masks: jnp.ndarray, cfg: LCRNetConfig) -> Pyramid:
    """(B, N0, 3) + (B, N0) -> batched Pyramid."""
    return build_pyramid_batched(
        points,
        masks,
        cfg.shapes.points,
        cfg.shapes.neighbor_limits,
        cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius,
        fast_select=cfg.fast_select,
        search_windows=cfg.shapes.search_windows,
    )


def make_pair_forward(cfg: LCRNetConfig, with_global_head: bool = True):
    """Jittable eval forward: (params, ref_points, ref_mask, src_points,
    src_mask) -> output dict (descriptors, nodes, correspondences, pose)."""
    model = LCRNet(cfg)

    def forward(params, ref_points, ref_mask, src_points, src_mask):
        points = jnp.stack([ref_points, src_points])
        masks = jnp.stack([ref_mask, src_mask])
        pyramid = build_batch_pyramid(points, masks, cfg)
        return model.apply(
            params,
            pyramid,
            None,
            training=False,
            with_global_head=with_global_head,
            with_fine_matching=True,
        )

    return forward


def make_pair_forward_mp(cfg: LCRNetConfig, mesh, with_global_head: bool = True):
    """Point-axis (mp) sharded pair forward via shard_map + ring halos.

    The explicit SPMD alternative to annotating shardings and letting XLA
    propagate: at production shapes the automatic path all-gathers whole
    point-axis activations (~908 MB/step measured, see
    tests/test_engine.py::test_sharded_step_collective_inventory_real_shapes),
    while this path's traffic is two ring ppermutes per fine-stage conv, one
    ~5 MB support all-gather at the stage-1->2 transition, and one fine-
    feature all-gather at the decoder exit — it scales with shard size, not
    cloud size.  Design notes in parallel/halo.py.

    mesh: a Mesh whose LAST axis is named "mp" (the point axis); the pyramid
    is built replicated per device (selection work, ~30 ms of the forward),
    the KPConv stages 0-1 compute on local shards, everything from stage 2 up
    runs replicated.  Outputs equal make_pair_forward's up to float reduction
    order.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    model = LCRNet(cfg)

    def local_forward(params, ref_points, ref_mask, src_points, src_mask):
        points = jnp.stack([ref_points, src_points])
        masks = jnp.stack([ref_mask, src_mask])
        pyramid = build_batch_pyramid(points, masks, cfg)
        return model.apply(
            params,
            pyramid,
            None,
            training=False,
            with_global_head=with_global_head,
            with_fine_matching=True,
            spmd_axis="mp",
        )

    sharded = shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=P(),
        check_rep=False,
    )
    return jax.jit(sharded)


def make_pairs_forward(cfg: LCRNetConfig, num_pairs: int, with_global_head: bool = True):
    """Multi-pair eval forward: (params, points (P, 2, N, 3), masks (P, 2, N))
    -> per-pair outputs with a leading P axis.  One program processes all
    pairs (pair-major cloud batch); per-pair results are identical to the
    single-pair path."""
    model = LCRNet(cfg)

    def forward(params, points, masks):
        p, two, n, _ = points.shape
        pyramid = build_batch_pyramid(points.reshape(p * two, n, 3), masks.reshape(p * two, n), cfg)
        return model.apply(
            params,
            pyramid,
            None,
            training=False,
            with_global_head=with_global_head,
            with_fine_matching=True,
            num_pairs=num_pairs,
        )

    return forward


def make_describe(cfg: LCRNetConfig):
    """Jittable descriptor extraction: (params, points (B,N,3), masks) -> (B, 256)."""
    model = LCRNet(cfg)

    def describe(params, points, masks):
        pyramid = build_batch_pyramid(points, masks, cfg)
        return model.apply(params, pyramid, method=LCRNet.describe)

    return describe


def init_params(cfg: LCRNetConfig, seed: int = 0):
    """Initialize the full parameter tree.

    Parameter shapes depend only on channel widths, not point budgets, so the
    init runs jitted on tiny shapes (fast even when the compile target is a
    remote TPU)."""
    import dataclasses

    from lcrnet_tpu.config import make_test_cfg

    small = make_test_cfg()
    small = dataclasses.replace(
        small,
        backbone=cfg.backbone,
        transformer=cfg.transformer,
        vote=cfg.vote,
        coarse_matching=dataclasses.replace(cfg.coarse_matching, num_targets=8),
    )
    model = LCRNet(small)
    n0 = small.shapes.points[0]
    import numpy as np

    rng = np.random.default_rng(cfg.seed)
    pts = np.full((2, n0, 3), 1.0e6, np.float32)
    msk = np.zeros((2, n0), bool)
    n_valid = min(384, n0)
    for b in range(2):
        side = int(np.ceil(np.sqrt(n_valid)))
        xy = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)[:n_valid]
        pts[b, :n_valid, :2] = xy * 0.4 + rng.uniform(-0.05, 0.05, (n_valid, 2))
        pts[b, :n_valid, 2] = rng.uniform(-0.1, 0.1, n_valid)
        msk[b, :n_valid] = True
    pyramid = build_batch_pyramid(jnp.asarray(pts), jnp.asarray(msk), small)

    @jax.jit
    def _init(pyr):
        return model.init(
            {"params": jax.random.PRNGKey(seed), "sampling": jax.random.PRNGKey(seed + 1)},
            pyr,
            jnp.eye(4),
            training=True,
            with_fine_matching=False,
        )

    return _init(pyramid)

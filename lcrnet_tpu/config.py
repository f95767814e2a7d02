"""Configuration dataclasses for LCR-Net TPU.

Pure-dataclass replacement for the reference's layered easydict singletons
(`experiments/lcrnet/config_model.py:8-127`, `config_reg.py:11-115`,
`config_ld.py:11-100` in the reference repo).  No import-time IO, no mutation
at runtime — configs are frozen and hashable so they can be closed over by
jitted functions.

The TPU build adds *static shape budgets* (`ShapeBudget`): the reference is
ragged (per-scan point counts, variable node counts); on TPU every stage has a
fixed capacity and a validity mask.  Defaults are sized for KITTI scans
downsampled at 0.3 m (~17k points).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple


@dataclass(frozen=True)
class ShapeBudget:
    """Static per-stage capacities (the TPU 'shape plan').

    Replaces the reference's ragged stacked tensors + length vectors with
    dense padded buffers.  `points` gives the per-cloud point capacity at each
    pyramid stage, `neighbor_limits` the per-stage neighbor-table width
    (reference calibrates these from data at 80% quantile,
    `experiments/lcrnet/data.py:408-433`; shipped values are around
    [64, 65, 74, 80] per `dataset_loop_detection.py:25`).
    """

    # stage-4 sized for the real 0.3 m-downsampled KITTI scans: the
    # reference pyramid on the demo pairs reaches 782-969 coarse points per
    # cloud (measured via experiments/full_parity.py against the reference's
    # own C++ collate); the earlier 768 budget silently cropped the x-sorted
    # tail of up to 20% of the coarse points
    points: Tuple[int, ...] = (20480, 8192, 2560, 1024)
    # measured 80% quantile over the real KITTI-00 demo scans
    # (data/calibrate.py on /root/reference/demo/data_demo, 2026-08; the
    # reference's own calibration lands at ~[64, 65, 74, 80])
    neighbor_limits: Tuple[int, ...] = (68, 63, 68, 62)
    # per-stage banded-search x-window widths (selection work scales with
    # the window).  Calibrated on the demo scans: worst-case in-slab support
    # count incl. the merged coarse sub-queries is (2619, 1350, 984, 498);
    # defaults carry 15-35% slack and 128-alignment.  Overflow truncates
    # farthest-in-x neighbors (the calibrated-limit truncation philosophy).
    search_windows: Tuple[int, ...] = (3072, 1792, 1408, 896)
    # width of the subsampling (coarse<-fine) pooling tables per transition
    # node budget after NMS (per cloud): the reference's greedy NMS keeps
    # 336-402 nodes per demo scan (measured by running its vote encoder
    # verbatim; see NOTES.md round 3) — 256 cropped up to a third of them
    max_nodes: int = 512
    # max coarse (node) correspondences; the dustbin-mode union of row/col
    # argmax winners holds at most M+N entries, so 2*max_nodes covers the
    # worst case exactly (reference keeps all, `superpoint_matching.py:146-151`)
    node_corr_limit: int = 1024
    corr_limit: int = 2048         # max global dense correspondences for LGR
    vote_neighbor_limit: int = 40  # runtime radius search around voted nodes


@dataclass(frozen=True)
class BackboneConfig:
    """KPConv backbone (reference `config_model.py:31-43`)."""

    num_stages: int = 4
    init_voxel_size: float = 0.3
    kernel_size: int = 15
    base_radius: float = 4.25
    base_sigma: float = 2.0
    group_norm: int = 32
    input_dim: int = 1
    init_dim: int = 64
    output_dim: int = 256

    @property
    def init_radius(self) -> float:
        return self.base_radius * self.init_voxel_size

    @property
    def init_sigma(self) -> float:
        return self.base_sigma * self.init_voxel_size


@dataclass(frozen=True)
class VoteConfig:
    """Vote layer + NMS (reference `config_model.py:74-80`)."""

    max_translate_range: float = 4.2
    nms_radius: float = 2.4
    input_feats_dim: int = 256


@dataclass(frozen=True)
class TransformerConfig:
    """3D-RoFormer (reference `config_model.py:65-72`, GAT block)."""

    input_dim: int = 1024
    hidden_dim: int = 128
    output_dim: int = 256
    num_heads: int = 4
    num_layers: int = 4
    # optional per-layer top-k sparse attention ratio (None = dense softmax,
    # matching the shipped config)
    topk_ratio: Optional[float] = None


@dataclass(frozen=True)
class ModelConfig:
    """Shared model params (reference `config_model.py:46-52`)."""

    ground_truth_matching_radius: float = 0.45
    num_points_in_patch: int = 128
    num_sinkhorn_iterations: int = 100
    ground_truth_corres_radius: float = 2.4
    n2p_score_threshold: float = 0.1
    p2p_score_threshold: float = 0.1


@dataclass(frozen=True)
class CoarseMatchingConfig:
    """Coarse (node) matching (reference `config_model.py:56-61`)."""

    num_targets: int = 128
    overlap_threshold: float = 0.1
    # None = dustbin mode (union of row/col argmax beating the dustbin);
    # an int requests at least that many correspondences.
    num_correspondences: Optional[int] = None
    # fixed-count semantics: True = the reference's threshold sweep (keep
    # ALL entries above the swept threshold, `superpoint_matching.py:162-186`,
    # bounded by shapes.node_corr_limit); False = exact top-k.
    threshold_sweep: bool = True


@dataclass(frozen=True)
class FineMatchingConfig:
    """Fine matching / LGR (reference `config_model.py:84-93`)."""

    topk: int = 1
    acceptance_radius: float = 0.45
    mutual: bool = False
    confidence_threshold: float = 0.0
    use_dustbin: bool = True
    use_global_score: bool = False
    correspondence_threshold: int = 3
    correspondence_limit: Optional[int] = None
    num_refinement_steps: int = 5


@dataclass(frozen=True)
class LossConfig:
    """Loss weights and margins (reference `config_model.py:96-122`)."""

    positive_overlap: float = 0.1        # coarse_loss.positive_overlap
    fine_positive_radius: float = 0.45   # fine_loss.positive_radius
    gap_gamma: float = 0.5               # distribution_loss.triplet_loss_gamma
    triplet_margin: float = 0.5          # triplet_loss.margin (retrieval)
    weight_coarse_loss: float = 1.0
    weight_vote_loss: float = 0.25
    weight_gap_loss: float = 5.0


@dataclass(frozen=True)
class EvalConfig:
    """Eval thresholds (reference `config_reg.py:62-67`)."""

    acceptance_overlap: float = 0.0
    acceptance_radius: float = 0.6
    inlier_ratio_threshold: float = 0.05
    rre_threshold: float = 5.0
    rte_threshold: float = 2.0


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer schedule (reference `config_reg.py:73-92`)."""

    lr: float = 1e-4
    lr_decay: float = 0.95
    lr_decay_steps: int = 4      # epochs per decay step
    weight_decay: float = 1e-6
    max_epoch: int = 150
    grad_acc_steps: int = 1
    optimizer: str = "adam"      # "adam" (registration) or "adan" (loop det)


@dataclass(frozen=True)
class TrainDataConfig:
    """Train-time data handling (reference `config_reg.py:38-50`)."""

    batch_size: int = 1          # pairs per device
    point_limit: int = 30000     # pre-pyramid cap on raw points
    use_augmentation: bool = True
    augmentation_noise: float = 0.01
    augmentation_min_scale: float = 0.8
    augmentation_max_scale: float = 1.2
    augmentation_shift: float = 2.0
    augmentation_rotation: float = 1.0   # yaw-only, fraction of 2*pi


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout for SPMD execution.

    dp: data parallel over scan pairs (replaces the reference's DDP/NCCL,
    `utils/engine/base_trainer.py:64-87`). mp: intra-pair model parallelism
    sharding the point axis of the backbone (no reference equivalent — the
    reference is DP-only, SURVEY.md §2.8).
    """

    dp: int = 1
    mp: int = 1


@dataclass(frozen=True)
class LCRNetConfig:
    """Top-level config: composition of all sub-configs."""

    seed: int = 7351
    # packed-integer extraction passes in the Pallas banded search (min-
    # reduce on (quantized d2, index) packed f32 instead of min+argmin):
    # 1.36x faster pyramid (measured); neighbors within r^2/2048 of each
    # other may swap in the truncation set
    fast_select: bool = True
    shapes: ShapeBudget = field(default_factory=ShapeBudget)
    backbone: BackboneConfig = field(default_factory=BackboneConfig)
    vote: VoteConfig = field(default_factory=VoteConfig)
    transformer: TransformerConfig = field(default_factory=TransformerConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    coarse_matching: CoarseMatchingConfig = field(default_factory=CoarseMatchingConfig)
    fine_matching: FineMatchingConfig = field(default_factory=FineMatchingConfig)
    loss: LossConfig = field(default_factory=LossConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainDataConfig = field(default_factory=TrainDataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    def replace(self, **kw) -> "LCRNetConfig":
        return dataclasses.replace(self, **kw)


def make_cfg(**overrides) -> LCRNetConfig:
    """Build the canonical config (mirrors reference `make_cfg`).

    Set LCRNET_PRESET=test in the environment to get the small-budget test
    config instead (used by CLI smoke tests)."""
    import os

    if os.environ.get("LCRNET_PRESET") == "test" and not overrides:
        return make_test_cfg()
    return LCRNetConfig(**overrides)


def make_test_cfg() -> LCRNetConfig:
    """Small config for unit tests: tiny budgets, few Sinkhorn iterations."""
    return LCRNetConfig(
        shapes=ShapeBudget(
            points=(512, 256, 128, 64),
            neighbor_limits=(16, 16, 16, 16),
            max_nodes=32,
            node_corr_limit=64,
            corr_limit=256,
            vote_neighbor_limit=16,
        ),
        model=ModelConfig(num_sinkhorn_iterations=10, num_points_in_patch=16),
        transformer=TransformerConfig(num_layers=2),
    )

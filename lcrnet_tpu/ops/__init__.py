"""Point-cloud ops library (L1): pure JAX/XLA with static shapes.

TPU-native replacement for the reference's `experiments/lcrnet/modules/ops/`
plus the native C++ extensions in `utils/extensions/` (grid_subsampling,
radius_neighbors, radius_filter).  Every op takes dense padded buffers with
explicit validity masks and returns fixed-shape results — no ragged tensors,
no host round-trips.
"""

from lcrnet_tpu.ops.pairwise_distance import pairwise_distance
from lcrnet_tpu.ops.transform import (
    apply_transform,
    apply_rotation,
    compose_transforms,
    get_rotation_translation_from_transform,
    get_transform_from_rotation_translation,
    inverse_transform,
    rodrigues_alignment_matrix,
    rodrigues_rotation_matrix,
    skew_symmetric_matrix,
)
from lcrnet_tpu.ops.masked import masked_max, masked_mean, masked_min, masked_softmax, masked_top_k
from lcrnet_tpu.ops.grid_subsample import grid_subsample
from lcrnet_tpu.ops.radius_search import (
    knn_search,
    nearest_search_batched,
    radius_search,
    radius_search_banded_batched,
    radius_search_batched,
    radius_search_cells_batched,
)
from lcrnet_tpu.ops.partition import knn_partition, point_to_node_partition
from lcrnet_tpu.ops.nms import greedy_radius_nms
from lcrnet_tpu.ops.sinkhorn import log_optimal_transport
from lcrnet_tpu.ops.procrustes import weighted_procrustes

PAD_COORD = 1.0e6  # coordinate value for padded points (mirrors the
# reference's inf-shadow-point convention, `modules/kpconv/kpconv.py:96`)

__all__ = [
    "PAD_COORD",
    "pairwise_distance",
    "apply_transform",
    "apply_rotation",
    "compose_transforms",
    "get_rotation_translation_from_transform",
    "get_transform_from_rotation_translation",
    "inverse_transform",
    "rodrigues_alignment_matrix",
    "rodrigues_rotation_matrix",
    "skew_symmetric_matrix",
    "masked_max",
    "masked_mean",
    "masked_min",
    "masked_softmax",
    "masked_top_k",
    "grid_subsample",
    "radius_search",
    "radius_search_batched",
    "radius_search_banded_batched",
    "radius_search_cells_batched",
    "nearest_search_batched",
    "knn_search",
    "knn_partition",
    "point_to_node_partition",
    "greedy_radius_nms",
    "log_optimal_transport",
    "weighted_procrustes",
]

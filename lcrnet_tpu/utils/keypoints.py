"""Host-side keypoint sampling utilities.

Parity target: `utils/utils/pointcloud.py:161-265` (random / score-ranked /
score-weighted / NMS keypoint sampling).  These are dataset-preparation
helpers that run on the host in the reference too, so they stay numpy; the
NMS variants reuse the same greedy first-come-by-score semantics as the
device NMS in `ops/nms.py` but operate on ragged host arrays.

Determinism: every stochastic sampler takes an explicit ``seed`` (the
reference uses the global ``np.random`` state).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def random_sample_keypoints(
    points: np.ndarray,
    feats: np.ndarray,
    num_keypoints: int,
    seed: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform subset without replacement (`pointcloud.py:161-172`)."""
    n = points.shape[0]
    if n > num_keypoints:
        idx = np.random.default_rng(seed).choice(n, num_keypoints, replace=False)
        return points[idx], feats[idx]
    return points, feats


def sample_keypoints_with_scores(
    points: np.ndarray,
    feats: np.ndarray,
    scores: np.ndarray,
    num_keypoints: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-k by score (`pointcloud.py:174-185`)."""
    if points.shape[0] > num_keypoints:
        idx = np.argsort(-scores)[:num_keypoints]
        return points[idx], feats[idx]
    return points, feats


def random_sample_keypoints_with_scores(
    points: np.ndarray,
    feats: np.ndarray,
    scores: np.ndarray,
    num_keypoints: int,
    seed: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Score-weighted sampling without replacement (`pointcloud.py:188-201`)."""
    n = points.shape[0]
    if n > num_keypoints:
        probs = scores / np.sum(scores)
        idx = np.random.default_rng(seed).choice(n, num_keypoints, replace=False, p=probs)
        return points[idx], feats[idx]
    return points, feats


def _greedy_nms_indices(points: np.ndarray, order: np.ndarray, radius: float,
                        max_keep: Optional[int] = None) -> np.ndarray:
    """Indices (into `order`-sorted arrays) surviving greedy radius NMS.

    Same first-come suppression as the reference's sequential loop
    (`pointcloud.py:204-229`): walk points in score order, keep a point iff
    no previously kept point lies within `radius`.  `max_keep` stops early
    once that many points are kept (the reference's `break` at
    `pointcloud.py:221`) — suppression vectors for later points are skipped.
    """
    sorted_points = points[order]
    n = len(order)
    radius2 = radius * radius
    alive = np.ones(n, dtype=bool)
    keep = []
    for i in range(n):
        if not alive[i]:
            continue
        keep.append(i)
        if max_keep is not None and len(keep) >= max_keep:
            break
        if i + 1 < n:
            d2 = np.sum((sorted_points[i + 1 :] - sorted_points[i]) ** 2, axis=1)
            alive[i + 1 :] &= d2 >= radius2
    return np.asarray(keep, dtype=np.int64)


def sample_keypoints_with_nms(
    points: np.ndarray,
    feats: np.ndarray,
    scores: np.ndarray,
    num_keypoints: int,
    radius: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy score-ordered NMS, truncated to num_keypoints
    (`pointcloud.py:204-229`)."""
    if points.shape[0] > num_keypoints:
        order = np.argsort(-scores, kind="stable")
        keep = _greedy_nms_indices(points, order, radius, max_keep=num_keypoints)
        sorted_points, sorted_feats = points[order], feats[order]
        return sorted_points[keep], sorted_feats[keep]
    return points, feats


def random_sample_keypoints_with_nms(
    points: np.ndarray,
    feats: np.ndarray,
    scores: np.ndarray,
    num_keypoints: int,
    radius: float,
    seed: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy NMS, then score-weighted random subset if still too many
    (`pointcloud.py:232-262`)."""
    if points.shape[0] > num_keypoints:
        order = np.argsort(-scores, kind="stable")
        keep = _greedy_nms_indices(points, order, radius)
        sorted_points, sorted_feats = points[order], feats[order]
        if len(keep) > num_keypoints:
            kept_scores = scores[order][keep]
            probs = kept_scores / np.sum(kept_scores)
            keep = np.random.default_rng(seed).choice(
                keep, num_keypoints, replace=False, p=probs
            )
        return sorted_points[keep], sorted_feats[keep]
    return points, feats


def regularize_normals(
    points: np.ndarray, normals: np.ndarray, positive: bool = True
) -> np.ndarray:
    """Flip normals to consistently face toward (or away from) the origin
    (`pointcloud.py:25-40`)."""
    dot = np.sum(points * normals, axis=1, keepdims=True)
    sign = -np.sign(dot) if positive else np.sign(dot)
    sign[sign == 0] = 1.0
    return normals * sign

"""Numpy registration metrics for offline evaluation.

Parity target: `utils/utils/registration.py:13-347` (RRE incl. per-axis
roll/pitch/yaw errors, RTE, inlier ratio, overlap, sparse/dense
correspondence evaluation) and `modules/registration/metrics.py:8-162`.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def get_rotation_translation(transform: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    return transform[..., :3, :3], transform[..., :3, 3]


def apply_transform_np(points: np.ndarray, transform: np.ndarray) -> np.ndarray:
    r, t = get_rotation_translation(transform)
    return points @ r.T + t


def relative_rotation_error(gt_r: np.ndarray, est_r: np.ndarray) -> float:
    """Geodesic rotation error in degrees.

    Chord form 2*arcsin(||Re - Rg||_F / (2*sqrt 2)): equal to the reference's
    acos-trace formulation for exact rotations, but stable for small angles —
    acos clips sub-1e-8 traces slightly above 1 straight to zero error."""
    x = np.linalg.norm(est_r - gt_r) / (2.0 * np.sqrt(2.0))
    return float(np.degrees(2.0 * np.arcsin(np.clip(x, 0.0, 1.0))))


def relative_translation_error(gt_t: np.ndarray, est_t: np.ndarray) -> float:
    return float(np.linalg.norm(gt_t - est_t))


def rotation_to_rpy_degrees(r: np.ndarray) -> np.ndarray:
    """ZYX euler decomposition -> (roll, pitch, yaw) in degrees."""
    sy = np.sqrt(r[0, 0] ** 2 + r[1, 0] ** 2)
    if sy > 1e-6:
        roll = np.arctan2(r[2, 1], r[2, 2])
        pitch = np.arctan2(-r[2, 0], sy)
        yaw = np.arctan2(r[1, 0], r[0, 0])
    else:
        roll = np.arctan2(-r[1, 2], r[1, 1])
        pitch = np.arctan2(-r[2, 0], sy)
        yaw = 0.0
    return np.degrees(np.array([roll, pitch, yaw]))


def compute_registration_error(gt_transform: np.ndarray, est_transform: np.ndarray) -> Dict[str, float]:
    """RRE/RTE plus per-axis rotation errors (reference
    `utils/utils/registration.py:50-110`)."""
    gt_r, gt_t = get_rotation_translation(gt_transform)
    est_r, est_t = get_rotation_translation(est_transform)
    rre = relative_rotation_error(gt_r, est_r)
    rte = relative_translation_error(gt_t, est_t)
    gt_rpy = rotation_to_rpy_degrees(gt_r)
    est_rpy = rotation_to_rpy_degrees(est_r)
    d = np.abs(gt_rpy - est_rpy)
    d = np.minimum(d, 360.0 - d)
    return {
        "RRE": rre,
        "RTE": rte,
        "Rx": float(d[0]),
        "Ry": float(d[1]),
        "Rz": float(d[2]),  # RYE (yaw error) in the closed-loop tables
    }


def compute_inlier_ratio(
    ref_corr: np.ndarray, src_corr: np.ndarray, transform: np.ndarray, radius: float = 0.6
) -> float:
    if len(ref_corr) == 0:
        return 0.0
    res = np.linalg.norm(ref_corr - apply_transform_np(src_corr, transform), axis=1)
    return float(np.mean(res < radius))


def evaluate_sparse_correspondences(
    ref_nodes: np.ndarray,
    src_nodes: np.ndarray,
    ref_corr_indices: np.ndarray,
    src_corr_indices: np.ndarray,
    gt_corr_map: np.ndarray,
) -> float:
    """Coarse precision (PIR): fraction of predicted node corrs in the GT map."""
    if len(ref_corr_indices) == 0:
        return 0.0
    return float(np.mean(gt_corr_map[ref_corr_indices, src_corr_indices]))


def compute_rotation_mse_and_mae(gt_r: np.ndarray, est_r: np.ndarray) -> Tuple[float, float]:
    """Anisotropic rotation error over xyz euler angles (degrees).

    Parity: `utils/utils/registration.py:116-123` (scipy Rotation euler)."""
    from scipy.spatial.transform import Rotation

    gt_e = Rotation.from_matrix(gt_r).as_euler("xyz", degrees=True)
    est_e = Rotation.from_matrix(est_r).as_euler("xyz", degrees=True)
    d = gt_e - est_e
    return float(np.mean(d**2)), float(np.mean(np.abs(d)))


def compute_translation_mse_and_mae(gt_t: np.ndarray, est_t: np.ndarray) -> Tuple[float, float]:
    """Parity: `utils/utils/registration.py:125-129`."""
    d = gt_t - est_t
    return float(np.mean(d**2)), float(np.mean(np.abs(d)))


def compute_transform_mse_and_mae(
    gt_transform: np.ndarray, est_transform: np.ndarray
) -> Tuple[float, float, float, float]:
    """Parity: `utils/utils/registration.py:132-138`."""
    gt_r, gt_t = get_rotation_translation(gt_transform)
    est_r, est_t = get_rotation_translation(est_transform)
    r_mse, r_mae = compute_rotation_mse_and_mae(gt_r, est_r)
    t_mse, t_mae = compute_translation_mse_and_mae(gt_t, est_t)
    return r_mse, r_mae, t_mse, t_mae


def compute_registration_rmse(
    src_points: np.ndarray, gt_transform: np.ndarray, est_transform: np.ndarray
) -> float:
    """Mean re-alignment residual of src under gt vs est transform
    (parity: `utils/utils/registration.py:141-157`)."""
    gt_points = apply_transform_np(src_points, gt_transform)
    est_points = apply_transform_np(src_points, est_transform)
    return float(np.linalg.norm(gt_points - est_points, axis=1).mean())


def compute_correspondence_residual(
    ref_corr: np.ndarray, src_corr: np.ndarray, transform: np.ndarray
) -> float:
    """Mean residual of a correspondence set under transform
    (parity: `utils/utils/registration.py:180-185`)."""
    res = np.linalg.norm(ref_corr - apply_transform_np(src_corr, transform), axis=1)
    return float(np.mean(res)) if len(res) else 0.0


def nearest_neighbor_distances(
    q_points: np.ndarray, s_points: np.ndarray, return_index: bool = False
):
    """Distance from each q point to its nearest s point (KD-tree)."""
    from scipy.spatial import cKDTree

    d, idx = cKDTree(s_points).query(q_points, k=1)
    if return_index:
        return d, idx
    return d


def compute_overlap(
    ref_points: np.ndarray,
    src_points: np.ndarray,
    transform: np.ndarray | None = None,
    positive_radius: float = 0.1,
) -> float:
    """Fraction of ref points with a src neighbor within radius
    (parity: `utils/utils/registration.py:196-203`)."""
    if transform is not None:
        src_points = apply_transform_np(src_points, transform)
    nn = nearest_neighbor_distances(ref_points, src_points)
    return float(np.mean(nn < positive_radius))


def get_correspondences(
    ref_points: np.ndarray,
    src_points: np.ndarray,
    transform: np.ndarray | None = None,
    matching_radius: float = 0.1,
) -> np.ndarray:
    """All (ref_idx, src_idx) pairs within matching_radius, as (C, 2) int64
    (parity: `utils/utils/registration.py:208-224`)."""
    from scipy.spatial import cKDTree

    if transform is not None:
        src_points = apply_transform_np(src_points, transform)
    lists = cKDTree(src_points).query_ball_point(ref_points, matching_radius)
    pairs = [(i, j) for i, js in enumerate(lists) for j in js]
    return np.array(pairs, dtype=np.int64).reshape(-1, 2)


def extract_corr_indices_from_feats(
    ref_feats: np.ndarray,
    src_feats: np.ndarray,
    mutual: bool = False,
    bilateral: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Feature-space NN correspondence extraction
    (parity: `utils/utils/registration.py:227-260`)."""
    _, ref_nn = nearest_neighbor_distances(ref_feats, src_feats, return_index=True)
    if mutual or bilateral:
        _, src_nn = nearest_neighbor_distances(src_feats, ref_feats, return_index=True)
        ref_indices = np.arange(ref_feats.shape[0])
        if mutual:
            keep = src_nn[ref_nn] == ref_indices
            ref_corr = ref_indices[keep]
            return ref_corr, ref_nn[ref_corr]
        src_indices = np.arange(src_feats.shape[0])
        return (
            np.concatenate([ref_indices, src_nn]),
            np.concatenate([ref_nn, src_indices]),
        )
    return np.arange(ref_feats.shape[0]), ref_nn


def extract_correspondences_from_feats(
    ref_points: np.ndarray,
    src_points: np.ndarray,
    ref_feats: np.ndarray,
    src_feats: np.ndarray,
    mutual: bool = False,
    return_feat_dist: bool = False,
):
    """Parity: `utils/utils/registration.py:263-281`."""
    ref_idx, src_idx = extract_corr_indices_from_feats(ref_feats, src_feats, mutual=mutual)
    out = [ref_points[ref_idx], src_points[src_idx]]
    if return_feat_dist:
        out.append(np.linalg.norm(ref_feats[ref_idx] - src_feats[src_idx], axis=1))
    return out


def evaluate_correspondences(
    ref_points: np.ndarray,
    src_points: np.ndarray,
    transform: np.ndarray,
    positive_radius: float = 0.1,
) -> Dict[str, float]:
    """Overlap + IR at (radius, 0.3, 0.1) + residual over a correspondence set
    (parity: `utils/utils/registration.py:303-316`)."""
    return {
        "overlap": compute_overlap(ref_points, src_points, transform, positive_radius),
        "inlier_ratio": compute_inlier_ratio(ref_points, src_points, transform, positive_radius),
        "inlier_ratio_0.3": compute_inlier_ratio(ref_points, src_points, transform, 0.3),
        "inlier_ratio_0.1": compute_inlier_ratio(ref_points, src_points, transform, 0.1),
        "residual": compute_correspondence_residual(ref_points, src_points, transform),
        "num_corr": float(ref_points.shape[0]),
    }


def farthest_point_sample(
    points: np.ndarray, num_points: int, seed: int | None = None
) -> np.ndarray:
    """FPS index set (parity: `utils/utils/registration.py:284-300`, which
    forgets its return statement — sic; deterministic here under a seed)."""
    rng = np.random.default_rng(seed)
    n = points.shape[0]
    indices = np.zeros((num_points,), dtype=np.int64)
    distances = np.full((n,), np.inf)
    farthest = int(rng.integers(n))
    for i in range(num_points):
        indices[i] = farthest
        d = np.sum((points - points[farthest]) ** 2, axis=1)
        distances = np.minimum(distances, d)
        farthest = int(np.argmax(distances))
    return indices


def registration_recall(
    results: list, rre_threshold: float = 5.0, rte_threshold: float = 2.0
) -> Dict[str, float]:
    """Aggregate per-pair error dicts into RR + mean errors over recalled
    pairs (the reference averages RRE/RTE over successful pairs only)."""
    if not results:
        return {"RR": 0.0, "RRE": 0.0, "RTE": 0.0}
    ok = [r for r in results if r["RRE"] < rre_threshold and r["RTE"] < rte_threshold]
    rr = len(ok) / len(results)
    return {
        "RR": 100.0 * rr,
        "RRE": float(np.mean([r["RRE"] for r in ok])) if ok else float("nan"),
        "RTE": float(np.mean([r["RTE"] for r in ok])) if ok else float("nan"),
        "RYE": float(np.mean([r["Rz"] for r in ok])) if ok and "Rz" in ok[0] else float("nan"),
    }

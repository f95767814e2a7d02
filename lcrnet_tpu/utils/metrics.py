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

"""Numpy reference oracles.

Each oracle re-states the semantics of the reference implementation
(C++ extensions / torch ops) in plain numpy so the JAX ops can be verified
against behaviorally-equivalent, independently-written code.
"""

from __future__ import annotations

import numpy as np


def grid_subsample_oracle(points: np.ndarray, voxel_size: float) -> np.ndarray:
    """Voxel barycenter subsample; semantics of
    `utils/extensions/cpu/grid_subsampling/grid_subsampling_cpu.cpp:3-48`.
    Returns voxel barycenters sorted by voxel id (canonical order)."""
    min_corner = points.min(axis=0)
    max_corner = points.max(axis=0)
    origin = np.floor(min_corner / voxel_size) * voxel_size
    n_cells = (np.floor((max_corner - origin) / voxel_size) + 1).astype(np.int64)
    ijk = np.floor((points - origin) / voxel_size).astype(np.int64)
    ids = ijk[:, 0] + n_cells[0] * ijk[:, 1] + n_cells[0] * n_cells[1] * ijk[:, 2]
    uniq, inverse = np.unique(ids, return_inverse=True)
    sums = np.zeros((len(uniq), 3))
    counts = np.zeros(len(uniq))
    np.add.at(sums, inverse, points)
    np.add.at(counts, inverse, 1.0)
    return sums / counts[:, None]


def radius_neighbors_oracle(
    q_points: np.ndarray, s_points: np.ndarray, radius: float, limit: int
):
    """Per-query neighbors within radius, nearest first, truncated to limit.
    Semantics of `radius_neighbors_cpu.cpp:3-91` + the limit truncation in
    `modules/ops/radius_search.py:7-27`.  Returns (indices, valid) with
    sentinel index len(s_points)."""
    d2 = ((q_points[:, None, :] - s_points[None, :, :]) ** 2).sum(-1)
    n = len(s_points)
    idx = np.full((len(q_points), limit), n, dtype=np.int64)
    valid = np.zeros((len(q_points), limit), dtype=bool)
    for i in range(len(q_points)):
        within = np.nonzero(d2[i] <= radius * radius)[0]
        order = within[np.argsort(d2[i][within], kind="stable")][:limit]
        idx[i, : len(order)] = order
        valid[i, : len(order)] = True
    return idx, valid


def greedy_nms_oracle(nodes: np.ndarray, radius: float) -> np.ndarray:
    """Sequential first-come greedy NMS; semantics of
    `modules/vote/vote.py:36-70` (keep node iff farther than radius from all
    previously kept)."""
    keep = np.zeros(len(nodes), dtype=bool)
    for i in range(len(nodes)):
        kept = nodes[keep]
        if len(kept) == 0 or np.all(np.linalg.norm(kept - nodes[i], axis=1) > radius):
            keep[i] = True
    return keep


def point_to_node_oracle(points: np.ndarray, nodes: np.ndarray, limit: int):
    """Semantics of `modules/ops/pointcloud_partition.py:61-120` (fixed-bug
    variant)."""
    d2 = ((nodes[:, None, :] - points[None, :, :]) ** 2).sum(-1)
    p2n = d2.argmin(axis=0)
    occupied = np.zeros(len(nodes), dtype=bool)
    occupied[p2n] = True
    knn_idx = np.full((len(nodes), limit), len(points), dtype=np.int64)
    knn_mask = np.zeros((len(nodes), limit), dtype=bool)
    for m in range(len(nodes)):
        assigned = np.nonzero(p2n == m)[0]
        order = assigned[np.argsort(d2[m][assigned], kind="stable")][:limit]
        knn_idx[m, : len(order)] = order
        knn_mask[m, : len(order)] = True
    return p2n, occupied, knn_idx, knn_mask


def sinkhorn_oracle(scores, alpha, row_masks, col_masks, iters):
    """Semantics of `modules/sinkhorn/learnable_sinkhorn.py:5-70`."""
    inf = 1e12
    b, m, n = scores.shape
    padded = np.full((b, m + 1, n + 1), alpha, dtype=np.float64)
    padded[:, :m, :n] = scores
    row_inv = np.concatenate([~row_masks, np.zeros((b, 1), bool)], axis=1)
    col_inv = np.concatenate([~col_masks, np.zeros((b, 1), bool)], axis=1)
    bad = row_inv[:, :, None] | col_inv[:, None, :]
    padded[bad] = -inf

    nvr = row_masks.sum(1).astype(np.float64)
    nvc = col_masks.sum(1).astype(np.float64)
    norm = -np.log(nvr + nvc)
    log_mu = np.concatenate([np.tile(norm[:, None], (1, m)), (np.log(nvc) + norm)[:, None]], axis=1)
    log_mu[row_inv] = -inf
    log_nu = np.concatenate([np.tile(norm[:, None], (1, n)), (np.log(nvr) + norm)[:, None]], axis=1)
    log_nu[col_inv] = -inf

    def lse(x, axis):
        x_max = np.clip(x.max(axis=axis, keepdims=True), -1e30, 1e30)
        return np.squeeze(x_max, axis) + np.log(np.exp(x - x_max).sum(axis=axis))

    u = np.zeros_like(log_mu)
    v = np.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - lse(padded + v[:, None, :], 2)
        v = log_nu - lse(padded + u[:, :, None], 1)
    return padded + u[:, :, None] + v[:, None, :] - norm[:, None, None]


def procrustes_oracle(src, ref, weights):
    """Semantics of `modules/registration/procrustes.py:6-91`."""
    w = weights / (weights.sum() + 1e-5)
    src_c = src - (src * w[:, None]).sum(0)
    ref_c = ref - (ref * w[:, None]).sum(0)
    h = src_c.T @ (w[:, None] * ref_c)
    u, _, vt = np.linalg.svd(h)
    v = vt.T
    d = np.sign(np.linalg.det(v @ u.T))
    r = v @ np.diag([1.0, 1.0, d]) @ u.T
    t = (ref * w[:, None]).sum(0) - r @ (src * w[:, None]).sum(0)
    out = np.eye(4)
    out[:3, :3] = r
    out[:3, 3] = t
    return out


def random_se3(rng, max_angle=np.pi, max_trans=5.0):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    angle = rng.uniform(0, max_angle)
    k = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    r = np.eye(3) + np.sin(angle) * k + (1 - np.cos(angle)) * (k @ k)
    t = rng.uniform(-max_trans, max_trans, size=3)
    out = np.eye(4)
    out[:3, :3] = r
    out[:3, 3] = t
    return out

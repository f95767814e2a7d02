"""Visualization and artifact export.

Parity target: `utils/utils/visualization.py:19-489` + `utils/utils/open3d.py`
(open3d scene builders for shifted nodes, correspondences, registration
results).  open3d is not available in this environment, so the primitives are
split: pure-numpy scene assembly (colored point sets + correspondence line
segments, with the reference's true/false coloring and z-offset layout)
exported as PLY files any viewer can open; when open3d *is* importable, the
same scenes render interactively.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import numpy as np


def _as_colors(points: np.ndarray, color: Sequence[float]) -> np.ndarray:
    return np.tile(np.asarray(color, np.float32)[None, :], (len(points), 1))


def write_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None,
              edges: Optional[np.ndarray] = None,
              edge_colors: Optional[np.ndarray] = None):
    """Minimal ASCII PLY writer (points, colors, optional colored line
    edges — the true/false green/red correspondence coloring rides the edge
    element's RGB properties)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    n = len(points)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if colors is not None:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        if edges is not None:
            f.write(f"element edge {len(edges)}\n")
            f.write("property int vertex1\nproperty int vertex2\n")
            if edge_colors is not None:
                f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{points[i, 0]:.4f} {points[i, 1]:.4f} {points[i, 2]:.4f}"
            if colors is not None:
                c = (np.clip(colors[i], 0, 1) * 255).astype(int)
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")
        if edges is not None:
            for j, (a, b) in enumerate(edges):
                row = f"{int(a)} {int(b)}"
                if edge_colors is not None:
                    c = (np.clip(edge_colors[j], 0, 1) * 255).astype(int)
                    row += f" {c[0]} {c[1]} {c[2]}"
                f.write(row + "\n")


def correspondence_scene(
    ref_points: np.ndarray,
    src_points: np.ndarray,
    ref_corr: np.ndarray,
    src_corr: np.ndarray,
    corr_correct: Optional[np.ndarray] = None,
    offset: Tuple[float, float, float] = (0.0, 0.0, -60.0),
    ref_color=(0.6, 0.1, 0.1),
    src_color=(0.1, 0.6, 0.1),
):
    """Build the reference's correspondence visualization (clouds stacked
    with a z-offset, correspondence segments colored green/red by
    correctness).  Returns (points, colors, edges, edge_colors)."""
    src_shifted = src_points + np.asarray(offset, np.float32)
    src_corr_shifted = src_corr + np.asarray(offset, np.float32)
    pts = np.concatenate([ref_points, src_shifted, ref_corr, src_corr_shifted])
    cols = np.concatenate(
        [
            _as_colors(ref_points, ref_color),
            _as_colors(src_shifted, src_color),
            _as_colors(ref_corr, (1, 1, 0)),
            _as_colors(src_corr_shifted, (1, 1, 0)),
        ]
    )
    base = len(ref_points) + len(src_shifted)
    c = len(ref_corr)
    edges = np.stack([np.arange(c) + base, np.arange(c) + base + c], axis=1)
    if corr_correct is None:
        edge_colors = _as_colors(edges, (0, 1, 0))
    else:
        edge_colors = np.where(
            corr_correct[:, None], np.array([[0.0, 1.0, 0.0]]), np.array([[1.0, 0.0, 0.0]])
        )
    return pts, cols, edges, edge_colors


def shifted_node_scene(
    points: np.ndarray,
    original_nodes: np.ndarray,
    shifted_nodes: np.ndarray,
    point_color=(0.1, 0.6, 0.1),
    node_color=(1.0, 0.0, 0.0),
    shifted_color=(1.0, 0.5, 0.0),
):
    """The reference's vote visualization: cloud + original nodes + arrows to
    shifted node positions (`vis_shifte_node`)."""
    pts = np.concatenate([points, original_nodes, shifted_nodes])
    cols = np.concatenate(
        [
            _as_colors(points, point_color),
            _as_colors(original_nodes, node_color),
            _as_colors(shifted_nodes, shifted_color),
        ]
    )
    n = len(points)
    m = len(original_nodes)
    edges = np.stack([np.arange(m) + n, np.arange(m) + n + m], axis=1)
    return pts, cols, edges


def export_scene(path: str, pts, cols, edges=None, edge_colors=None):
    """Write a scene to PLY; if open3d is importable, also return an open3d
    geometry list for interactive use."""
    write_ply(path, pts, cols, edges)
    try:
        import open3d as o3d  # pragma: no cover - optional dependency

        pcd = o3d.geometry.PointCloud()
        pcd.points = o3d.utility.Vector3dVector(pts)
        pcd.colors = o3d.utility.Vector3dVector(cols)
        geoms = [pcd]
        if edges is not None:
            ls = o3d.geometry.LineSet()
            ls.points = o3d.utility.Vector3dVector(pts)
            ls.lines = o3d.utility.Vector2iVector(edges)
            if edge_colors is not None:
                ls.colors = o3d.utility.Vector3dVector(edge_colors)
            geoms.append(ls)
        return geoms
    except ImportError:
        return None


def find_true_false(
    src_corr: np.ndarray,
    ref_corr: np.ndarray,
    transform: np.ndarray,
    node_corr_indices: Optional[np.ndarray] = None,
    thres: float = 1.0,
) -> np.ndarray:
    """Classify correspondences as true/false under the GT transform
    (reference `utils/utils/visualization.py:260-271`): src points are
    transformed and a pair is true when the residual is below `thres`."""
    src_t = src_corr @ np.asarray(transform[:3, :3], np.float32).T + np.asarray(
        transform[:3, 3], np.float32
    )
    if node_corr_indices is None:
        return np.linalg.norm(ref_corr - src_t, axis=-1) < thres
    return (
        np.linalg.norm(
            src_t[node_corr_indices[:, 1]] - ref_corr[node_corr_indices[:, 0]], axis=-1
        )
        < thres
    )


def find_true_false_node(
    num_ref_nodes: int,
    num_src_nodes: int,
    node_corr_indices: np.ndarray,
    gt_corr: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Split predicted node correspondences into GT-confirmed and spurious
    sets and report precision (reference `visualization.py:273-305`).

    Args: node_corr_indices / gt_corr: (C, 2) [ref_idx, src_idx] rows.
    Returns (true_pairs (T, 2), false_pairs (F, 2), precision)."""
    gt_mat = np.zeros((num_ref_nodes, num_src_nodes), bool)
    gt_mat[gt_corr[:, 0], gt_corr[:, 1]] = True
    pred_mat = np.zeros_like(gt_mat)
    pred_mat[node_corr_indices[:, 0], node_corr_indices[:, 1]] = True
    pos = gt_mat & pred_mat
    true_pairs = np.argwhere(pos)
    false_pairs = np.argwhere(pred_mat & ~pos)
    n_pred = max(int(pred_mat.sum()), 1)
    return true_pairs, false_pairs, float(pos.sum()) / n_pred


def point_to_node_scene(
    points: np.ndarray,
    nodes: np.ndarray,
    point_to_node: np.ndarray,
    node_colors: Optional[np.ndarray] = None,
    node_color=(1.0, 0.0, 0.0),
    seed: int = 0,
):
    """Color every point by its node assignment (reference
    `draw_point_to_node`, `visualization.py:307-333`); nodes are appended in
    `node_color`.  Returns (points, colors)."""
    if node_colors is None:
        node_colors = np.random.default_rng(seed).random(nodes.shape)
    point_colors = node_colors[np.clip(point_to_node, 0, len(nodes) - 1)]
    pts = np.concatenate([points, nodes])
    cols = np.concatenate([point_colors, _as_colors(nodes, node_color)])
    return pts.astype(np.float32), cols.astype(np.float32)


def node_correspondence_scene(
    ref_points: np.ndarray,
    src_points: np.ndarray,
    ref_nodes: np.ndarray,
    src_nodes: np.ndarray,
    node_corr_indices: np.ndarray,
    corr_correct: Optional[np.ndarray] = None,
    offset: Tuple[float, float, float] = (0.0, 0.0, -60.0),
    ref_color=(0.6, 0.1, 0.1),
    src_color=(0.1, 0.6, 0.1),
    ref_node_color=(1.0, 0.0, 0.0),
    src_node_color=(0.0, 1.0, 0.0),
):
    """Node-correspondence line set over offset-stacked clouds with
    true (green) / false (red) edge coloring (reference
    `draw_node_correspondences`, `visualization.py:336-415`).
    Returns (points, colors, edges, edge_colors)."""
    off = np.asarray(offset, np.float32)
    src_shifted = src_points + off
    src_nodes_shifted = src_nodes + off
    pts = np.concatenate([ref_points, src_shifted, ref_nodes, src_nodes_shifted])
    cols = np.concatenate(
        [
            _as_colors(ref_points, ref_color),
            _as_colors(src_shifted, src_color),
            _as_colors(ref_nodes, ref_node_color),
            _as_colors(src_nodes_shifted, src_node_color),
        ]
    )
    base = len(ref_points) + len(src_points)
    edges = np.stack(
        [node_corr_indices[:, 0] + base, node_corr_indices[:, 1] + base + len(ref_nodes)],
        axis=1,
    )
    if corr_correct is None:
        edge_colors = _as_colors(edges, (0, 1, 0))
    else:
        edge_colors = np.where(
            corr_correct[:, None], np.array([[0.0, 1.0, 0.0]]), np.array([[1.0, 0.0, 0.0]])
        ).astype(np.float32)
    return pts.astype(np.float32), cols, edges, edge_colors

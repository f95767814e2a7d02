"""Scene-builder tests incl. a golden-file PLY check on a tiny scene.

Parity targets: `utils/utils/visualization.py:19-489` (vis_shifte_node,
visualization, find_true_false, find_true_false_node, draw_point_to_node,
draw_node_correspondences) re-expressed as headless numpy scene assembly +
PLY export.
"""

import os.path as osp

import numpy as np

from lcrnet_tpu.utils.visualization import (
    correspondence_scene,
    find_true_false,
    find_true_false_node,
    node_correspondence_scene,
    point_to_node_scene,
    shifted_node_scene,
    write_ply,
)

GOLDEN_SCENE = osp.join(osp.dirname(osp.abspath(__file__)), "data", "golden_scene.ply")


def _tiny_scene():
    ref = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    src = np.array([[0, 0, 1], [1, 0, 1]], np.float32)
    ref_corr = ref[:2]
    src_corr = src[:2]
    correct = np.array([True, False])
    return correspondence_scene(ref, src, ref_corr, src_corr, correct,
                                offset=(0.0, 0.0, -5.0))


def test_correspondence_scene_golden(tmp_path):
    """The tiny demo scene's PLY bytes are pinned: any change to the scene
    layout (point order, offset handling, color mapping, edge indexing) is a
    deliberate, reviewed change to this file's golden."""
    pts, cols, edges, edge_colors = _tiny_scene()
    out = str(tmp_path / "scene.ply")
    write_ply(out, pts, cols, edges)
    with open(out) as f:
        got = f.read()
    with open(GOLDEN_SCENE) as f:
        want = f.read()
    assert got == want


def test_correspondence_scene_edges_point_into_corr_block():
    pts, cols, edges, edge_colors = _tiny_scene()
    assert pts.shape == (9, 3)         # 3 ref + 2 src + 2 + 2 corr endpoints
    # every edge joins a ref-corr vertex to its src-corr partner
    assert (edges[:, 0] == np.array([5, 6])).all()
    assert (edges[:, 1] == np.array([7, 8])).all()
    # true/false edge coloring
    np.testing.assert_array_equal(edge_colors[0], [0, 1, 0])
    np.testing.assert_array_equal(edge_colors[1], [1, 0, 0])
    # the src block is z-offset
    np.testing.assert_allclose(pts[3:5, 2], -4.0)


def test_find_true_false_matches_transform_residual(rng):
    yaw = 0.6
    c, s = np.cos(yaw), np.sin(yaw)
    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    t[:3, 3] = [2.0, -1.0, 0.3]
    src = rng.normal(size=(30, 3)).astype(np.float32) * 5
    ref = src @ t[:3, :3].T + t[:3, 3]
    noise = np.zeros((30, 1), np.float32)
    noise[::3] = 2.0  # every 3rd pair pushed beyond thres=1
    ref_noisy = ref + noise
    flags = find_true_false(src, ref_noisy, t, thres=1.0)
    want = (noise[:, 0] < 1.0)
    np.testing.assert_array_equal(flags, want)


def test_find_true_false_node_precision():
    gt = np.array([[0, 0], [1, 1], [2, 2]])
    pred = np.array([[0, 0], [1, 2], [2, 2]])
    true_pairs, false_pairs, precision = find_true_false_node(4, 4, pred, gt)
    assert {tuple(p) for p in true_pairs} == {(0, 0), (2, 2)}
    assert {tuple(p) for p in false_pairs} == {(1, 2)}
    assert precision == 2.0 / 3.0


def test_point_to_node_scene_assignment_coloring():
    points = np.zeros((5, 3), np.float32)
    nodes = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
    p2n = np.array([0, 0, 1, 1, 1])
    node_colors = np.array([[1, 0, 0], [0, 0, 1]], np.float32)
    pts, cols = point_to_node_scene(points, nodes, p2n, node_colors)
    assert pts.shape == (7, 3)
    np.testing.assert_array_equal(cols[:2], [[1, 0, 0]] * 2)
    np.testing.assert_array_equal(cols[2:5], [[0, 0, 1]] * 3)
    np.testing.assert_array_equal(cols[5:], [[1, 0, 0]] * 2)  # nodes red


def test_node_correspondence_scene_layout():
    ref_pts = np.zeros((4, 3), np.float32)
    src_pts = np.zeros((3, 3), np.float32)
    ref_nodes = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
    src_nodes = np.array([[0, 1, 0], [1, 1, 0]], np.float32)
    corr = np.array([[0, 1], [1, 0]])
    ok = np.array([True, False])
    pts, cols, edges, ecols = node_correspondence_scene(
        ref_pts, src_pts, ref_nodes, src_nodes, corr, ok, offset=(0, 0, -2.0)
    )
    assert pts.shape == (11, 3)
    # edges index the node blocks (after 4 + 3 cloud points)
    np.testing.assert_array_equal(edges, [[7, 10], [8, 9]])
    np.testing.assert_array_equal(ecols, [[0, 1, 0], [1, 0, 0]])
    # src nodes offset along z
    np.testing.assert_allclose(pts[9:, 2], -2.0)


def test_shifted_node_scene_edges():
    points = np.zeros((6, 3), np.float32)
    orig = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
    shifted = orig + [0.2, 0.0, 0.0]
    pts, cols, edges = shifted_node_scene(points, orig, shifted)
    assert pts.shape == (10, 3)
    np.testing.assert_array_equal(edges, [[6, 8], [7, 9]])

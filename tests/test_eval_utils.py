"""Tests for the host-side evaluation/keypoint utilities
(`utils/utils/registration.py` + `utils/utils/pointcloud.py` parity)."""

import numpy as np
import pytest

from lcrnet_tpu.utils.keypoints import (
    random_sample_keypoints,
    random_sample_keypoints_with_nms,
    random_sample_keypoints_with_scores,
    regularize_normals,
    sample_keypoints_with_nms,
    sample_keypoints_with_scores,
)
from lcrnet_tpu.utils.metrics import (
    apply_transform_np,
    compute_correspondence_residual,
    compute_overlap,
    compute_registration_rmse,
    compute_rotation_mse_and_mae,
    compute_transform_mse_and_mae,
    evaluate_correspondences,
    extract_corr_indices_from_feats,
    extract_correspondences_from_feats,
    farthest_point_sample,
    get_correspondences,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def random_transform(rng, angle=0.3, shift=1.0):
    a = rng.uniform(-angle, angle)
    c, s = np.cos(a), np.sin(a)
    t = np.eye(4)
    t[:3, :3] = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    t[:3, 3] = rng.uniform(-shift, shift, 3)
    return t


def test_mse_mae_zero_on_identical(rng):
    t = random_transform(rng)
    r_mse, r_mae, t_mse, t_mae = compute_transform_mse_and_mae(t, t)
    assert r_mse == r_mae == t_mse == t_mae == 0.0


def test_rotation_mae_matches_planar_yaw():
    a = np.radians(10.0)
    c, s = np.cos(a), np.sin(a)
    rz = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
    mse, mae = compute_rotation_mse_and_mae(np.eye(3), rz)
    # only yaw differs by 10 deg -> mae = 10/3, mse = 100/3
    assert np.isclose(mae, 10.0 / 3.0, atol=1e-6)
    assert np.isclose(mse, 100.0 / 3.0, atol=1e-5)


def test_registration_rmse_is_mean_realignment_error(rng):
    pts = rng.normal(size=(100, 3))
    gt = random_transform(rng)
    est = gt.copy()
    est[:3, 3] += np.array([0.2, 0.0, 0.0])  # pure 0.2 m translation offset
    assert np.isclose(compute_registration_rmse(pts, gt, est), 0.2, atol=1e-6)


def test_correspondence_residual_and_overlap(rng):
    src = rng.uniform(-5, 5, (200, 3))
    t = random_transform(rng)
    ref = apply_transform_np(src, t)
    assert compute_correspondence_residual(ref, src, t) < 1e-6
    assert compute_overlap(ref, src, t, positive_radius=0.1) == 1.0
    # shift half the src far away -> overlap ~0.5
    src2 = src.copy()
    src2[:100] += 100.0
    ov = compute_overlap(ref, src2, t, positive_radius=0.1)
    assert 0.45 <= ov <= 0.55


def test_get_correspondences_exact_pairs(rng):
    src = rng.uniform(-5, 5, (50, 3))
    t = random_transform(rng)
    ref = apply_transform_np(src, t)
    corr = get_correspondences(ref, src, t, matching_radius=1e-3)
    # every point matches itself (clouds are sparse at 1e-3 radius)
    assert corr.shape[1] == 2
    self_pairs = corr[corr[:, 0] == corr[:, 1]]
    assert len(self_pairs) == 50


def test_extract_corr_from_feats_mutual(rng):
    feats = rng.normal(size=(30, 16))
    perm = rng.permutation(30)
    ref_idx, src_idx = extract_corr_indices_from_feats(
        feats, feats[perm], mutual=True
    )
    # mutual NN of identical (permuted) features is the permutation itself
    assert np.array_equal(perm[src_idx], ref_idx)
    pts = rng.normal(size=(30, 3))
    out = extract_correspondences_from_feats(
        pts, pts[perm], feats, feats[perm], mutual=True, return_feat_dist=True
    )
    assert np.allclose(out[0], out[1])
    assert np.allclose(out[2], 0.0)


def test_extract_corr_bilateral_shapes(rng):
    ref_f = rng.normal(size=(20, 8))
    src_f = rng.normal(size=(25, 8))
    ref_idx, src_idx = extract_corr_indices_from_feats(ref_f, src_f, bilateral=True)
    assert len(ref_idx) == len(src_idx) == 45


def test_evaluate_correspondences_keys(rng):
    src = rng.uniform(-5, 5, (100, 3))
    t = random_transform(rng)
    ref = apply_transform_np(src, t)
    out = evaluate_correspondences(ref, src, t, positive_radius=0.1)
    assert out["inlier_ratio"] == 1.0 and out["overlap"] == 1.0
    assert out["num_corr"] == 100.0 and out["residual"] < 1e-6


def test_farthest_point_sample_spreads(rng):
    # two well-separated clusters: 2-point FPS must take one from each
    a = rng.normal(size=(50, 3)) * 0.1
    b = rng.normal(size=(50, 3)) * 0.1 + 10.0
    pts = np.concatenate([a, b])
    idx = farthest_point_sample(pts, 2, seed=0)
    assert len(set(idx.tolist())) == 2
    assert (idx < 50).sum() == 1  # one index per cluster
    # deterministic under the same seed
    assert np.array_equal(idx, farthest_point_sample(pts, 2, seed=0))


def test_keypoint_samplers(rng):
    pts = rng.uniform(-5, 5, (200, 3))
    feats = rng.normal(size=(200, 8))
    scores = rng.uniform(0.1, 1.0, 200)

    p, f = random_sample_keypoints(pts, feats, 64, seed=1)
    assert p.shape == (64, 3) and f.shape == (64, 8)

    p, f = sample_keypoints_with_scores(pts, feats, scores, 64)
    top = np.argsort(-scores)[:64]
    assert np.allclose(p, pts[top]) and np.allclose(f, feats[top])

    p, f = random_sample_keypoints_with_scores(pts, feats, scores, 64, seed=1)
    assert p.shape == (64, 3)

    # no-op when already small enough
    p, f = random_sample_keypoints(pts[:10], feats[:10], 64)
    assert p.shape == (10, 3)


def test_nms_keypoints_respect_radius(rng):
    pts = rng.uniform(-5, 5, (300, 3))
    feats = rng.normal(size=(300, 4))
    scores = rng.uniform(0.1, 1.0, 300)
    p, f = sample_keypoints_with_nms(pts, feats, scores, 32, radius=1.0)
    assert p.shape[0] <= 32
    d = np.linalg.norm(p[:, None] - p[None, :], axis=-1)
    np.fill_diagonal(d, np.inf)
    assert d.min() >= 1.0  # greedy suppression guarantee

    p2, f2 = random_sample_keypoints_with_nms(pts, feats, scores, 16, radius=0.5, seed=3)
    assert p2.shape[0] <= 16
    d2 = np.linalg.norm(p2[:, None] - p2[None, :], axis=-1)
    np.fill_diagonal(d2, np.inf)
    assert d2.min() >= 0.5


def test_regularize_normals(rng):
    pts = rng.normal(size=(50, 3)) + np.array([5.0, 0, 0])
    normals = rng.normal(size=(50, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    reg = regularize_normals(pts, normals, positive=True)
    assert (np.sum(pts * reg, axis=1) <= 0).all()
    reg2 = regularize_normals(pts, normals, positive=False)
    assert (np.sum(pts * reg2, axis=1) >= 0).all()


def test_profile_trace_aggregation(tmp_path):
    """profile_forward's parser: metadata-track naming, track filtering,
    per-op self-time sums, multi-file merge, latest-session selection."""
    import gzip
    import json
    import os.path as osp
    import sys

    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "experiments"))
    import profile_forward as pf

    events = [
        {"ph": "M", "pid": 1, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name", "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name", "args": {"name": "host"}},
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.1", "dur": 100,
         "args": {"source": "a.py:1"}},
        {"ph": "X", "pid": 1, "tid": 2, "name": "fusion.1", "dur": 50},
        {"ph": "X", "pid": 9, "tid": 0, "name": "hostwork", "dur": 999},
    ]
    agg = pf.aggregate(events, "TPU")
    assert list(agg) == ["/device:TPU:0/XLA Ops"]
    dur, count, args = agg["/device:TPU:0/XLA Ops"]["fusion.1"]
    assert (dur, count) == (150.0, 2)
    assert args["source"] == "a.py:1"

    # two sessions on disk; only the newest one's files are returned
    old = tmp_path / "plugins" / "profile" / "2026_01_01"
    new = tmp_path / "plugins" / "profile" / "2026_02_02"
    for d in (old, new):
        d.mkdir(parents=True)
    for d, n in ((old, 1), (new, 2)):
        for i in range(n):
            with gzip.open(d / f"h{i}.trace.json.gz", "wt") as f:
                json.dump({"traceEvents": events}, f)
    files = pf.find_trace_files(str(tmp_path))
    assert len(files) == 2 and all("2026_02_02" in f for f in files)

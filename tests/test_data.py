"""Tests for the data pipeline: KITTI utils, loaders, pair generators."""

import os.path as osp

import numpy as np
import pytest

from lcrnet_tpu.config import make_test_cfg
from lcrnet_tpu.data.generators import (
    generate_loop_pairs,
    generate_registration_pairs,
    icp_refine,
    scan_overlap,
)
from lcrnet_tpu.data.kitti import (
    AugmentConfig,
    augment_pair,
    load_kitti_gt_pose,
    pad_points,
    relative_transform,
    voxel_downsample,
    yaw_rotation,
)
from lcrnet_tpu.data.loader import RegistrationPairDataset, batch_pairs, pair_loader

from oracles import grid_subsample_oracle, random_se3


def circle_poses(n=500, radius=50.0):
    """Synthetic looping trajectory (two laps of a circle)."""
    poses = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        a = 4 * np.pi * i / n  # two laps
        poses[i, 0, 3] = radius * np.cos(a)
        poses[i, 1, 3] = radius * np.sin(a)
        c, s = np.cos(a), np.sin(a)
        poses[i, :3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    return poses


def test_voxel_downsample_matches_oracle(rng):
    pts = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    got = voxel_downsample(pts, 1.0)
    want = grid_subsample_oracle(pts.astype(np.float64), 1.0)
    assert len(got) == len(want)
    np.testing.assert_allclose(got[np.lexsort(got.T)], want[np.lexsort(want.T)], atol=1e-4)


def test_relative_transform_roundtrip(rng):
    pa = random_se3(rng)
    pb = random_se3(rng)
    t = relative_transform(pa, pb)  # src(b-frame) points -> a-frame
    p_world = rng.normal(size=3)
    p_a = np.linalg.inv(pa) @ np.append(p_world, 1.0)
    p_b = np.linalg.inv(pb) @ np.append(p_world, 1.0)
    np.testing.assert_allclose(t @ p_b, p_a, atol=1e-6)


def test_augment_pair_preserves_alignment(rng):
    src = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    t = random_se3(rng).astype(np.float32)
    ref = (src @ t[:3, :3].T + t[:3, 3]).astype(np.float32)
    cfg = AugmentConfig(noise=0.0)
    ref2, src2, t2 = augment_pair(ref, src, t, rng, cfg)
    aligned = src2 @ t2[:3, :3].T + t2[:3, 3]
    np.testing.assert_allclose(aligned, ref2, atol=1e-3)


def test_augment_pair_applies_scale_shift_noise(rng):
    """The full reference recipe (`dataset.py:114-143`): uniform noise bound,
    scale in [min, max] applied to the geometry, per-cloud shift folded into
    the transform."""
    src = rng.uniform(-5, 5, (500, 3)).astype(np.float32)
    t = random_se3(rng).astype(np.float32)
    ref = (src @ t[:3, :3].T + t[:3, 3]).astype(np.float32)

    # noise-only config: displacement must be bounded by noise/2 (uniform)
    cfg = AugmentConfig(noise=0.1, rotation=0.0, min_scale=1.0, max_scale=1.0, shift=0.0)
    ref2, _, _ = augment_pair(ref.copy(), src.copy(), t, rng, cfg)
    d = np.abs(ref2 - ref)
    assert d.max() <= 0.05 + 1e-6 and d.max() > 0.0

    # scale-only: pairwise extents scale together, alignment preserved
    cfg = AugmentConfig(noise=0.0, rotation=0.0, min_scale=1.5, max_scale=1.5, shift=0.0)
    ref3, src3, t3 = augment_pair(ref.copy(), src.copy(), t, rng, cfg)
    np.testing.assert_allclose(src3, src * 1.5, atol=1e-5)
    np.testing.assert_allclose(src3 @ t3[:3, :3].T + t3[:3, 3], ref3, atol=1e-4)

    # shift-only: clouds move independently but the transform tracks it
    cfg = AugmentConfig(noise=0.0, rotation=0.0, min_scale=1.0, max_scale=1.0, shift=3.0)
    ref4, src4, t4 = augment_pair(ref.copy(), src.copy(), t, rng, cfg)
    assert np.linalg.norm((ref4 - ref).mean(axis=0)) > 1e-3
    np.testing.assert_allclose(src4 @ t4[:3, :3].T + t4[:3, 3], ref4, atol=1e-4)


def test_pad_points_cap_and_mask(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    out, mask = pad_points(pts, 128)
    assert mask.sum() == 100
    np.testing.assert_allclose(out[:100], pts)
    out2, mask2 = pad_points(pts, 128, point_limit=50, rng=rng)
    assert mask2.sum() == 50


def test_generate_registration_pairs_spacing():
    poses = circle_poses()
    pairs = generate_registration_pairs(poses, min_distance=10.0)
    assert len(pairs) > 10
    pos = poses[:, :3, 3]
    for p in pairs:
        # reference semantics: pos is the frame BEFORE the first one farther
        # than min_distance — pair distance just under the threshold, and the
        # next frame crosses it
        d = np.linalg.norm(pos[p["pos_idx"]] - pos[p["anc_idx"]])
        assert d <= 10.0
        d_next = np.linalg.norm(pos[p["pos_idx"] + 1] - pos[p["anc_idx"]])
        assert d_next > 10.0
        # transform maps src (anc) points into ref (pos) frame
        t = p["transform"]
        origin_src_in_world = pos[p["anc_idx"]]
        origin_in_ref = np.linalg.inv(poses[p["pos_idx"]]) @ np.append(origin_src_in_world, 1.0)
        np.testing.assert_allclose(t[:3, 3], origin_in_ref[:3], atol=1e-5)


def test_generators_skip_nan_pose_gaps():
    """KITTI-360-style pose gaps (NaN-filled frames) must never pair: a gap
    frame is neither an anchor nor a positive in any generator."""
    from lcrnet_tpu.data.generators import generate_loop_rows, generate_mixed_rows

    poses = circle_poses()
    gap = list(range(40, 60)) + list(range(200, 260))
    poses[gap] = np.nan
    bad = set(gap)
    reg = generate_registration_pairs(poses, min_distance=10.0)
    assert reg and not any(p["anc_idx"] in bad or p["pos_idx"] in bad for p in reg)
    for rows in (generate_loop_rows(poses, 4.0), generate_mixed_rows(poses)):
        assert rows
        for r in rows:
            assert r["anc_idx"] not in bad
            assert not any(int(j) in bad for j in r["pos_idx"])
            assert np.isfinite(r["pose"]).all()


def test_generate_loop_pairs_revisits():
    poses = circle_poses()
    pairs = generate_loop_pairs(poses, max_distance=4.0, min_index_gap=100)
    assert len(pairs) > 0
    for p in pairs:
        assert p["anc_idx"] - p["pos_idx"] >= 100


def test_icp_refine_converges(rng):
    ref = rng.uniform(-10, 10, (800, 3)).astype(np.float32)
    true_t = random_se3(rng, max_angle=0.2, max_trans=0.5).astype(np.float32)
    inv = np.linalg.inv(true_t)
    src = (ref @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    # perturbed init
    noise_t = random_se3(rng, max_angle=0.03, max_trans=0.1).astype(np.float32)
    init = (noise_t @ true_t).astype(np.float32)
    refined = icp_refine(src, ref, init, max_corr_dist=1.0, iterations=30)
    err_before = np.linalg.norm(init[:3, 3] - true_t[:3, 3])
    err_after = np.linalg.norm(refined[:3, 3] - true_t[:3, 3])
    assert err_after < err_before
    assert err_after < 0.02


def test_scan_overlap_full_and_none(rng):
    pts = rng.uniform(-10, 10, (300, 3)).astype(np.float32)
    assert scan_overlap(pts, pts, np.eye(4, dtype=np.float32)) == 1.0
    far = pts + 100.0
    assert scan_overlap(far, pts, np.eye(4, dtype=np.float32)) == 0.0


def test_pair_dataset_and_loader(rng):
    cfg = make_test_cfg()
    scans = {i: rng.uniform(-5, 5, (300, 3)).astype(np.float32) for i in range(6)}
    pairs = [
        {"anc_idx": i, "pos_idx": i + 1, "transform": np.eye(4, dtype=np.float32)}
        for i in range(5)
    ]
    ds = RegistrationPairDataset(lambda i: scans[i], pairs, cfg)
    assert len(ds) == 5
    sample = ds[0]
    assert sample["points"].shape == (2, cfg.shapes.points[0], 3)
    batches = list(pair_loader(ds, batch_size=2, shuffle=True, seed=1))
    assert len(batches) == 2
    assert batches[0].points.shape == (2, 2, cfg.shapes.points[0], 3)


def test_overlap_gt_writer_roundtrip(tmp_path):
    """Writer emits the reference on-disk format
    (`loop_gt_seq00_0.3overlap_inactive.npz`: one object array of per-anchor
    positive lists) and `load_overlap_gt` reads it back; the real reference
    file (when present) loads through the same path."""
    import sys

    sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "experiments"))
    from test_loop_detection import load_overlap_gt

    from lcrnet_tpu.data.generators import write_overlap_gt

    gt = [[], [0], [], [0, 1], [2]]
    p = str(tmp_path / "gt.npz")
    write_overlap_gt(p, gt)
    assert load_overlap_gt(p, 5) == gt

    ref_file = (
        "/root/reference/assets/data/kitti/loop_detection/overlap/"
        "loop_gt_seq00_0.3overlap_inactive.npz"
    )
    if osp.exists(ref_file):
        real = load_overlap_gt(ref_file, 4541)
        assert 958 in real[3854] and 26 in real[4481]


def test_mixed_rows_roundtrip(tmp_path):
    """generate_mixed_rows -> write_pairs_npz -> load_pair_npz_mixed emits
    the reference mixed schema (`generate_kitti_pairs_mixed.py:155`): rows of
    {seq_id, anc_idx, pos_idx (k,), pose (k,4,4)}, pose = anc points into the
    pos frame; loop rows (distance < 10 m, 50-frame lag) are appended."""
    from lcrnet_tpu.data.generators import generate_mixed_rows, write_pairs_npz
    from lcrnet_tpu.data.kitti import load_pair_npz_mixed

    poses = circle_poses()
    rows = generate_mixed_rows(poses, seq_id=7)
    assert len(rows) > 10
    pos = poses[:, :3, 3]
    # the walk emits anchors spaced by ~anchor_min_distance and positives
    # in the (1, 15) m window; loop rows revisit with a >= 50 frame gap
    saw_loop_row = False
    for r in rows:
        assert set(r) == {"seq_id", "anc_idx", "pos_idx", "pose"}
        assert r["pose"].shape == (len(r["pos_idx"]), 4, 4)
        if (r["pos_idx"] > r["anc_idx"]).any():  # registration-walk row
            d = np.linalg.norm(pos[r["pos_idx"]] - pos[r["anc_idx"]], axis=1)
            assert ((d > 1.0) & (d < 15.0)).all()
        else:  # loop row
            saw_loop_row = True
            assert (r["anc_idx"] - r["pos_idx"] >= 50).all()
    assert saw_loop_row

    p = str(tmp_path / "00.npz")
    write_pairs_npz(p, rows)
    pairs = load_pair_npz_mixed(p)
    assert len(pairs) == sum(len(r["pos_idx"]) for r in rows)
    # direction: transform maps anc points into the pos frame
    s = pairs[0]
    expected = relative_transform(poses[s["pos_idx"]], poses[s["anc_idx"]])
    np.testing.assert_allclose(s["transform"], expected, atol=1e-5)
    assert s["seq_id"] == 7
    # frames filter keeps only pairs with both endpoints in the set
    some = {pairs[0]["anc_idx"], pairs[0]["pos_idx"]}
    sub = load_pair_npz_mixed(p, frames=some)
    assert all(q["anc_idx"] in some and q["pos_idx"] in some for q in sub)
    assert len(sub) >= 1

    ref_file = "/root/reference/assets/data/kitti/registration/mixed/00.npz"
    if osp.exists(ref_file):
        demo = {26, 560, 958, 3528, 3854, 4481}
        real = load_pair_npz_mixed(ref_file, frames=demo)
        got = {(q["anc_idx"], q["pos_idx"]) for q in real}
        assert got == {(3528, 560), (3854, 958), (4481, 26)}


def test_training_tuples_from_overlap_gt(tmp_path, rng):
    """LD training tuples (reference `dataset_overlap_online.py:187-210`
    metadata): anchors = frames with overlap positives; negatives sampled
    beyond neg_min_distance and outside the positive set; NaN-gap poses
    excluded everywhere; npz round-trips through train_loop_detection's
    loader schema."""
    import os.path as osp

    from lcrnet_tpu.data.generators import (
        generate_training_tuples,
        write_training_tuples,
    )

    n = 40
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, 0, 3] = np.arange(n) * 2.0       # straight line, 2 m spacing
    poses[5] = np.nan                          # KITTI-360-style pose gap
    overlap_gt = [[] for _ in range(n)]
    overlap_gt[30] = [2, 3]
    overlap_gt[35] = [5]                       # positive IS the NaN frame
    overlap_gt[20] = [19]

    tuples = generate_training_tuples(poses, overlap_gt, num_neg_store=6,
                                      neg_min_distance=15.0)
    assert list(tuples["anc_idx"]) == [20, 30]  # 35's only positive is NaN
    by_anchor = dict(zip(tuples["anc_idx"],
                         zip(tuples["pos_idx"], tuples["neg_idx"])))
    pos30, neg30 = by_anchor[30]
    assert list(pos30) == [2, 3]
    # negatives: > 15 m from frame 30 (|i-30| > 7.5), valid, not positive
    assert len(neg30) == 6
    d = np.abs(neg30 - 30) * 2.0
    assert (d > 15.0).all()
    assert 5 not in neg30 and not np.isin(neg30, pos30).any()

    path = str(tmp_path / "tuples.npz")
    write_training_tuples(path, tuples)
    d2 = np.load(path, allow_pickle=True)
    loaded = list(zip(d2["anc_idx"], d2["pos_idx"], d2["neg_idx"]))
    assert len(loaded) == 2 and int(loaded[1][0]) == 30

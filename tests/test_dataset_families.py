"""Loader tests for the non-KITTI dataset families (KITTI-360, Ford, Apollo,
MulRan) over synthetic directory trees — reference layouts per
`datasets/utils/{kitti360,ford,mulran}.py` and
`datasets/registration/apollo/dataset.py`."""

import os
import os.path as osp

import numpy as np
import pytest

from lcrnet_tpu.data.datasets import (
    ApolloSequence,
    FordSequence,
    Kitti360Sequence,
    MulranSequence,
    make_sequence,
)


def _write_bin(path, rng, n=500):
    pts = rng.uniform(-30, 30, (n, 4)).astype(np.float32)
    pts[:, 3] = 0.5
    pts.tofile(path)
    return pts[:, :3]


def _pose_rows(poses):
    return "\n".join(" ".join(f"{v:.9f}" for v in p[:3, :4].ravel()) for p in poses)


def _random_poses(rng, n):
    poses = np.tile(np.eye(4), (n, 1, 1))
    poses[:, :3, 3] = rng.uniform(-100, 100, (n, 3))
    return poses


def test_kitti360_tree(tmp_path, rng):
    root = str(tmp_path)
    drive = "2013_05_28_drive_0002_sync"
    scan_dir = osp.join(root, "data_3d_raw", drive, "velodyne_points", "data")
    os.makedirs(scan_dir)
    os.makedirs(osp.join(root, "data_poses", drive))
    os.makedirs(osp.join(root, "calibration"))
    raw = _write_bin(osp.join(scan_dir, f"{3:010d}.bin"), rng)

    # cam0-to-world poses: sparse frame ids (KITTI-360 skips frames)
    cam_poses = _random_poses(rng, 2)
    rows = []
    for fid, cp in zip([0, 3], cam_poses):
        rows.append(f"{fid} " + " ".join(f"{v:.9f}" for v in cp.ravel()))
    with open(osp.join(root, "data_poses", drive, "cam0_to_world.txt"), "w") as f:
        f.write("\n".join(rows))

    # cam-to-velo calibration with a nontrivial rotation
    t_cv = np.eye(4)
    t_cv[:3, :3] = [[0, -1, 0], [0, 0, -1], [1, 0, 0]]
    t_cv[:3, 3] = [0.1, -0.2, 0.3]
    with open(osp.join(root, "calibration", "calib_cam_to_velo.txt"), "w") as f:
        f.write(" ".join(f"{v:.9f}" for v in t_cv[:3, :4].ravel()))

    seq = Kitti360Sequence(root, 2)
    poses = seq.poses()
    assert poses.shape == (4, 4, 4)
    # conjugation: T_velo_w = T_cam_w @ inv(T_cam_velo)
    want = cam_poses[1] @ np.linalg.inv(t_cv)
    np.testing.assert_allclose(poses[3], want, atol=1e-6)
    scan = seq(3)
    assert scan.shape[1] == 3 and len(scan) > 0 and len(scan) <= len(raw)


def _write_npy_tree(root, sub, frames, rng, fmt="{:06d}.npy"):
    """Reference prepared tree: downsampled_xyzi/<sub>/<frame>.npy (N, 4)."""
    d = osp.join(root, "downsampled_xyzi", sub)
    os.makedirs(d, exist_ok=True)
    for f in frames:
        pts = rng.uniform(-30, 30, (100, 4)).astype(np.float32)
        np.save(osp.join(d, fmt.format(f)), pts)
    return d


def test_ford_reference_tree(tmp_path, rng):
    """A tree laid out per the reference's Ford convention
    (`datasets/registration/ford/dataset.py:90-95`: downsampled_xyzi/%02d/
    %06d.npy + sequences/%02d/poses.txt) loads unmodified."""
    root = str(tmp_path)
    _write_npy_tree(root, "01", [0, 1], rng)
    os.makedirs(osp.join(root, "sequences", "01"))
    poses = _random_poses(rng, 3)
    with open(osp.join(root, "sequences", "01", "poses.txt"), "w") as f:
        f.write(_pose_rows(poses))
    seq = FordSequence(root, 1)
    got = seq.poses()
    assert got.shape == (3, 4, 4)
    np.testing.assert_allclose(got[:, :3, :4], poses[:, :3, :4], atol=1e-6)
    scan = seq(0)
    assert scan.shape == (100, 3)


def test_ford_raw_tree_fallback(tmp_path, rng):
    root = str(tmp_path)
    d = osp.join(root, "IJRR-Dataset-1")
    os.makedirs(osp.join(d, "velodyne"))
    _write_bin(osp.join(d, "velodyne", f"{0:06d}.bin"), rng)
    poses = _random_poses(rng, 3)
    with open(osp.join(d, "poses.txt"), "w") as f:
        f.write(_pose_rows(poses))
    seq = FordSequence(root, 1)
    got = seq.poses()
    assert got.shape == (3, 4, 4)
    np.testing.assert_allclose(got[:, :3, :4], poses[:, :3, :4], atol=1e-6)
    assert seq(0).shape[1] == 3


def test_apollo_reference_tree(tmp_path, rng):
    """Reference Apollo convention (`datasets/registration/apollo/
    dataset.py:104-112`): integer seqs 1-4 under downsampled_xyzi/%02d."""
    root = str(tmp_path)
    _write_npy_tree(root, "02", [7], rng)
    seq = make_sequence("apollo", root, 2)
    assert seq(7).shape == (100, 3)


def test_apollo_raw_session_fallback(tmp_path, rng):
    root = str(tmp_path)
    session = "TrainData/BaylandsToSeafood"
    os.makedirs(osp.join(root, session, "pcds"))
    os.makedirs(osp.join(root, session, "poses"))
    _write_bin(osp.join(root, session, "pcds", f"{7:06d}.bin"), rng)
    poses = _random_poses(rng, 8)
    with open(osp.join(root, session, "poses", "gt_poses.txt"), "w") as f:
        f.write(_pose_rows(poses))
    seq = make_sequence("apollo", root, session)
    got = seq.poses()
    assert got.shape == (8, 4, 4)
    assert seq(7).shape[1] == 3


def test_mulran_tree(tmp_path, rng):
    root = str(tmp_path)
    sd = osp.join(root, "mulran", "kaist01", "sensor_data")
    os.makedirs(osp.join(sd, "Ouster"))
    stamps = [1561000000001, 1561000000500, 1561000001000]
    for s in stamps:
        _write_bin(osp.join(sd, "Ouster", f"{s}.bin"), rng)
    poses = _random_poses(rng, 3)
    with open(osp.join(sd, "poses_in_kitti_format.txt"), "w") as f:
        f.write(_pose_rows(poses))
    seq = MulranSequence(root, "kaist01")
    assert seq.stamps == stamps
    got = seq.poses()
    assert got.shape == (3, 4, 4)
    # frame index 1 resolves to the second timestamp-named scan
    assert seq(1).shape[1] == 3


def test_mulran_reference_tree(tmp_path, rng):
    """Prepared MulRan tree per `datasets/registration/mulran/dataset.py:111`:
    downsampled_xyzi/<seq>/<stamp>.npy with UNPADDED timestamp names, stamps
    enumerable without the raw Ouster bins."""
    root = str(tmp_path)
    stamps = [1561000000001, 1561000000500]
    _write_npy_tree(root, "kaist01", stamps, rng, fmt="{:d}.npy")
    sd = osp.join(root, "mulran", "kaist01", "sensor_data")
    os.makedirs(sd)
    poses = _random_poses(rng, 2)
    with open(osp.join(sd, "poses_in_kitti_format.txt"), "w") as f:
        f.write(_pose_rows(poses))
    seq = MulranSequence(root, "kaist01")
    assert seq.stamps == stamps
    assert seq.poses().shape == (2, 4, 4)
    assert seq(1).shape == (100, 3)


def test_count_frames_per_family(tmp_path, rng):
    """count_frames serves every family's CLI frame probing (down_dir npy +
    raw bin union; MulRan counts timestamps)."""
    from lcrnet_tpu.data.datasets import count_frames
    from lcrnet_tpu.data.kitti import KittiScanSource

    root = str(tmp_path / "kitti")
    os.makedirs(osp.join(root, "downsampled_xyzi", "00"))
    for i in range(3):
        np.save(osp.join(root, "downsampled_xyzi", "00", f"{i:06d}.npy"),
                rng.random((10, 3)).astype(np.float32))
    assert count_frames(KittiScanSource(root, 0)) == 3

    froot = str(tmp_path / "ford")
    d = osp.join(froot, "IJRR-Dataset-1")
    os.makedirs(osp.join(d, "velodyne"))
    for i in range(2):
        _write_bin(osp.join(d, "velodyne", f"{i:06d}.bin"), rng)
    assert count_frames(FordSequence(froot, 1)) == 2

    mroot = str(tmp_path / "mul")
    sd = osp.join(mroot, "mulran", "kaist01", "sensor_data", "Ouster")
    os.makedirs(sd)
    _write_bin(osp.join(sd, "1234.bin"), rng)
    assert count_frames(make_sequence("mulran", mroot, "kaist01")) == 1

"""Cross-implementation parser parity for the non-KITTI dataset families.

Generates small reference-format dataset trees (random poses, calibrations,
pair rows), parses them with the reference's OWN parsers
(`datasets/utils/{kitti,kitti360,ford,mulran}.py`, executed verbatim via the
tests/ref_torch.py shim) AND this framework's `data/datasets.py` /
`data/kitti.py`, and asserts identical pose matrices and pair records.
A transposed calibration or swapped frame convention fails these tests.
"""

import os
import os.path as osp

import numpy as np
import pytest

from tests.ref_torch import load_ref


def _random_se3(rng, n):
    """(n, 4, 4) random well-conditioned rigid transforms."""
    out = np.tile(np.eye(4), (n, 1, 1))
    for i in range(n):
        a, b, c = rng.uniform(-np.pi, np.pi, 3)

        def rot(ax, t):
            m = np.eye(3)
            i0, i1 = [(1, 2), (0, 2), (0, 1)][ax]
            m[i0, i0] = m[i1, i1] = np.cos(t)
            m[i0, i1], m[i1, i0] = -np.sin(t), np.sin(t)
            return m

        out[i, :3, :3] = rot(0, a) @ rot(1, b) @ rot(2, c)
        out[i, :3, 3] = rng.uniform(-100, 100, 3)
    return out


def _write_kitti_rows(path, poses):
    """12-float row-major (3, 4) rows, the KITTI odometry pose format."""
    with open(path, "w") as f:
        for p in poses:
            f.write(" ".join(f"{v:.9e}" for v in p[:3, :4].ravel()) + "\n")


def _write_pair_rows(path, pairs):
    """`anc pos r00..r23` rows (registration pair text, all families)."""
    with open(path, "w") as f:
        for anc, pos, t in pairs:
            f.write(f"{anc} {pos} " + " ".join(
                f"{v:.9e}" for v in t[:3, :4].ravel()) + "\n")


def test_pair_text_parity_all_families(tmp_path, rng):
    """The pair-text row schema is shared by every family: reference
    `load_kitti_gt_pair_registration` == `load_ford_gt_pair_registration`
    == kitti360/mulran variants == our `load_pair_text` (anc, pos,
    transform)."""
    ref_kitti = load_ref("experiments.lcrnet.datasets.utils.kitti")
    ref_ford = load_ref("experiments.lcrnet.datasets.utils.ford")
    ref_k360 = load_ref("experiments.lcrnet.datasets.utils.kitti360")
    ref_mulran = load_ref("experiments.lcrnet.datasets.utils.mulran")

    from lcrnet_tpu.data.kitti import load_pair_text

    transforms = _random_se3(rng, 5)
    pairs = [(int(rng.integers(0, 4000)), int(rng.integers(0, 4000)), t)
             for t in transforms]
    # each loader derives the file name from (root, seq) differently
    for fname, loader, seq in (
        ("00", lambda root: ref_kitti.load_kitti_gt_pair_registration(root, 0), 0),
        ("01", lambda root: ref_ford.load_ford_gt_pair_registration(root, 1), 1),
        ("0009", lambda root: ref_k360.load_gt_pair_registration(root, 9), 9),
        ("kaist01",
         lambda root: ref_mulran.load_mulran_gt_pair_registration(root, "kaist01"),
         "kaist01"),
    ):
        root = tmp_path / f"pairs_{fname}"
        root.mkdir()
        _write_pair_rows(str(root / fname), pairs)
        ref_rows = loader(str(root))
        our_rows = load_pair_text(str(root / fname))
        assert len(ref_rows) == len(our_rows) == len(pairs)
        for r, o, (anc, pos, t) in zip(ref_rows, our_rows, pairs):
            # reference convention: frame0 = pos (ref cloud), frame1 = anc
            assert (r["frame1"], r["frame0"]) == (anc, pos)
            assert (o["anc_idx"], o["pos_idx"]) == (anc, pos)
            np.testing.assert_allclose(r["transform"], t, rtol=0, atol=1e-6)
            np.testing.assert_allclose(o["transform"], t, rtol=0, atol=2e-5)


def test_kitti_pose_conjugation_vs_reference(tmp_path, rng):
    """KITTI: T_velo = Tr^-1 @ T_cam @ Tr with Tr from calib.txt
    (`datasets/utils/kitti.py:74-104`)."""
    ref_kitti = load_ref("experiments.lcrnet.datasets.utils.kitti")
    from lcrnet_tpu.data.kitti import load_kitti_gt_pose

    n = 7
    cam_poses = _random_se3(rng, n)
    tr = _random_se3(rng, 1)[0]

    root = tmp_path / "kitti"
    seq_dir = root / "semantic-kitti-labels" / "dataset" / "sequences" / "02"
    seq_dir.mkdir(parents=True)
    _write_kitti_rows(str(seq_dir / "poses.txt"), cam_poses)
    calib_dir = root / "calib" / "sequences" / "02"
    calib_dir.mkdir(parents=True)
    with open(calib_dir / "calib.txt", "w") as f:
        for name in ("P0", "P1", "P2", "P3"):
            f.write(name + ": " + " ".join(["0"] * 12) + "\n")
        f.write("Tr: " + " ".join(f"{v:.9e}" for v in tr[:3, :4].ravel()) + "\n")

    ref_poses = ref_kitti.load_kitti_gt_pose(str(root), 2, only_poses=True)
    ours = load_kitti_gt_pose(str(seq_dir / "poses.txt"),
                              str(calib_dir / "calib.txt"))
    assert ref_poses.shape == ours.shape == (n, 4, 4)
    np.testing.assert_allclose(ours, ref_poses, rtol=1e-5, atol=1e-4)


def test_kitti360_pose_conjugation_vs_reference(tmp_path, rng):
    """KITTI-360: T_velo_pose = T_cam0_world @ cam0_to_velo^-1, rows indexed
    by the pose file's frame column (`datasets/utils/kitti360.py:23-77`)."""
    ref_k360 = load_ref("experiments.lcrnet.datasets.utils.kitti360")
    from lcrnet_tpu.data.datasets import Kitti360Sequence

    n = 6
    cam_poses = _random_se3(rng, n)
    cam0_to_velo = _random_se3(rng, 1)[0]
    frame_ids = [0, 2, 3, 7, 8, 11]  # gaps: KITTI-360 drops stationary frames

    root = tmp_path / "kitti360"
    drive = "2013_05_28_drive_0009_sync"
    pose_dir = root / "data_poses" / drive
    pose_dir.mkdir(parents=True)
    with open(pose_dir / "cam0_to_world.txt", "w") as f:
        for fid, p in zip(frame_ids, cam_poses):
            f.write(f"{fid} " + " ".join(f"{v:.9e}" for v in p.ravel()) + "\n")
    calib_dir = root / "calibration"
    calib_dir.mkdir()
    with open(calib_dir / "calib_cam_to_velo.txt", "w") as f:
        f.write(" ".join(f"{v:.9e}" for v in cam0_to_velo[:3, :4].ravel()) + "\n")

    ref_poses, ref_ids = ref_k360.load_gt_pose(str(root), 9, only_poses=True)
    seq = Kitti360Sequence(str(root), 9)
    ours = seq.poses()

    assert list(ref_ids) == frame_ids
    # ours is dense-indexed with NaN gaps; reference is compact + id list
    for fid, ref_p in zip(ref_ids, ref_poses):
        np.testing.assert_allclose(ours[fid], ref_p, rtol=1e-5, atol=1e-4)
    gap_ids = sorted(set(range(max(frame_ids) + 1)) - set(frame_ids))
    assert gap_ids and np.isnan(ours[gap_ids]).all()


def test_ford_pose_rows_vs_reference(tmp_path, rng):
    """Ford: plain 12-float LiDAR-frame rows, NO conjugation
    (`datasets/utils/ford.py:33-56`)."""
    ref_ford = load_ref("experiments.lcrnet.datasets.utils.ford")
    from lcrnet_tpu.data.datasets import FordSequence

    n = 5
    poses = _random_se3(rng, n)
    root = tmp_path / "ford"
    seq_dir = root / "sequences" / "01"
    seq_dir.mkdir(parents=True)
    _write_kitti_rows(str(seq_dir / "poses.txt"), poses)

    ref_poses = ref_ford.load_ford_gt_pose(str(root), 1, only_poses=True)
    ours = FordSequence(str(root), 1).poses()
    np.testing.assert_allclose(ours, ref_poses, rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(ref_poses, poses, rtol=1e-6, atol=1e-5)


def test_mulran_pose_rows_and_stamps_vs_reference(tmp_path, rng):
    """MulRan: 12-float LiDAR-frame rows under
    `mulran/<seq>/sensor_data/poses_in_kitti_format.txt`; pose row i belongs
    to the i-th SORTED Ouster bin timestamp (`datasets/utils/mulran.py:29-60`)."""
    ref_mulran = load_ref("experiments.lcrnet.datasets.utils.mulran")
    from lcrnet_tpu.data.datasets import MulranSequence

    n = 5
    poses = _random_se3(rng, n)
    stamps = sorted(int(s) for s in rng.choice(
        np.arange(1_560_000_000_000, 1_560_000_500_000, 7, dtype=np.int64),
        size=n, replace=False))
    root = tmp_path / "mulran_root"
    sensor = root / "mulran" / "kaist01" / "sensor_data"
    ouster = sensor / "Ouster"
    ouster.mkdir(parents=True)
    _write_kitti_rows(str(sensor / "poses_in_kitti_format.txt"), poses)
    # shuffled creation order; both sides must SORT numerically
    for s in rng.permutation(stamps):
        (ouster / f"{int(s)}.bin").write_bytes(b"")

    ref_rows = ref_mulran.load_mulran_gt_pose(str(root), "kaist01")
    seq = MulranSequence(str(root), "kaist01")
    ours = seq.poses()

    assert [r["idx"] for r in ref_rows] == stamps == seq.stamps
    for i, r in enumerate(ref_rows):
        np.testing.assert_allclose(ours[i], r["pose"], rtol=1e-6, atol=1e-5)


def test_apollo_pair_loader_is_kitti_loader(tmp_path, rng):
    """Apollo reuses the KITTI pair loader verbatim
    (`datasets/registration/apollo/dataset.py:14,22`); pin that our pair
    parser agrees on an apollo-layout pair file."""
    ref_kitti = load_ref("experiments.lcrnet.datasets.utils.kitti")
    from lcrnet_tpu.data.kitti import load_pair_text

    t = _random_se3(rng, 3)
    pairs = [(i * 11, i * 17 + 3, t[i]) for i in range(3)]
    root = tmp_path / "apollo_pairs"
    root.mkdir()
    _write_pair_rows(str(root / "01"), pairs)
    ref_rows = ref_kitti.load_kitti_gt_pair_registration(str(root), 1)
    our_rows = load_pair_text(str(root / "01"))
    for r, o, (anc, pos, tt) in zip(ref_rows, our_rows, pairs):
        assert (r["frame1"], r["frame0"]) == (o["anc_idx"], o["pos_idx"]) == (anc, pos)
        np.testing.assert_allclose(r["transform"], o["transform"], rtol=0, atol=2e-5)

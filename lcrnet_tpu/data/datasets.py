"""Additional dataset families: KITTI-360, Ford Campus, Apollo, MulRan.

Parity targets: `experiments/lcrnet/datasets/utils/{kitti360,ford,mulran}.py`
and `datasets/registration/{kitti_360,ford,apollo,mulran}/dataset.py`.  Every
family shares the same contract as KITTI: a per-frame scan source, per-frame
poses in the LiDAR frame, and pair lists (`anc pos r00..r23` text rows).
The pair-text format is identical across families; the differences are the
directory layouts, pose formats, and frame-id conventions below.
"""

from __future__ import annotations

import glob
import os
import os.path as osp
from typing import Callable, List, Optional

import numpy as np

from lcrnet_tpu.data.kitti import load_pair_text, voxel_downsample
from lcrnet_tpu.native.host_ops import load_kitti_bin_native

# canonical evaluation sequences (reference SURVEY.md §2.5 / README tables)
KITTI360_TEST_SEQS = [2, 9]
MULRAN_SEQS = ["kaist01", "riveside01", "sejong01"]


def _bin_source(scan_dir: str, voxel_size: float, pattern: str = "{idx:06d}.bin",
                down_dir: Optional[str] = None) -> Callable[[int], np.ndarray]:
    def load(idx: int) -> np.ndarray:
        if down_dir:
            npy = osp.join(down_dir, f"{idx:06d}.npy")
            if osp.exists(npy):
                return np.ascontiguousarray(np.load(npy)[:, :3], np.float32)
        pts = load_kitti_bin_native(osp.join(scan_dir, pattern.format(idx=idx)))
        return voxel_downsample(pts, voxel_size)

    return load


class Kitti360Sequence:
    """KITTI-360: velodyne bins under `data_3d_raw/<drive>/velodyne_points/
    data/`, cam0-to-world poses + calibration conjugation (reference
    `datasets/utils/kitti360.py`)."""

    def __init__(self, root: str, seq: int, voxel_size: float = 0.3):
        drive = f"2013_05_28_drive_{seq:04d}_sync"
        self.scan_dir = osp.join(root, "data_3d_raw", drive, "velodyne_points", "data")
        self.down_dir = osp.join(root, "downsampled", f"{seq:04d}")
        self.pose_path = osp.join(root, "data_poses", drive, "cam0_to_world.txt")
        self.calib_path = osp.join(root, "calibration", "calib_cam_to_velo.txt")
        self.source = _bin_source(self.scan_dir, voxel_size, "{idx:010d}.bin", self.down_dir)

    def poses(self) -> np.ndarray:
        """(N, 4, 4) LiDAR-frame poses: T_velo = (T_cam_w @ T_cam_velo)^-1
        composition, row-indexed by the pose file's frame column."""
        raw = np.loadtxt(self.pose_path)
        frame_ids = raw[:, 0].astype(int)
        cam_poses = raw[:, 1:17].reshape(-1, 4, 4)
        cam_to_velo = np.loadtxt(self.calib_path).reshape(3, 4)
        t_cv = np.eye(4)
        t_cv[:3, :4] = cam_to_velo
        velo_poses = cam_poses @ np.linalg.inv(t_cv)[None]
        # KITTI-360 pose files omit frames (stationary segments); mark the
        # gaps NaN so downstream pair generation skips them instead of
        # treating origin-identity fills as real revisits
        out = np.full((frame_ids.max() + 1, 4, 4), np.nan)
        out[frame_ids] = velo_poses
        return out

    def __call__(self, idx: int) -> np.ndarray:
        return self.source(idx)


def _kitti_row_poses(path: str) -> np.ndarray:
    """(N, 4, 4) from 12-float KITTI-style pose rows (row-major 3x4)."""
    raw = np.loadtxt(path)
    if raw.ndim == 1:
        raw = raw[None]
    poses = np.tile(np.eye(4), (len(raw), 1, 1))
    poses[:, :3, :4] = raw[:, -12:].reshape(-1, 3, 4)
    return poses


class FordSequence:
    """Ford Campus, reference prepared-tree layout first: scans from
    `downsampled_xyzi/%02d/%06d.npy` and poses from
    `sequences/%02d/poses.txt` — plain 12-float rows in the LiDAR frame,
    no velo<->cam conjugation (reference
    `datasets/registration/ford/dataset.py:90-95`,
    `datasets/utils/ford.py:33-56`).  Falls back to a raw IJRR tree
    (`IJRR-Dataset-<seq>/velodyne/%06d.bin` + `poses.txt`) when the
    prepared tree is absent."""

    def __init__(self, root: str, seq: int, voxel_size: float = 0.3):
        raw = osp.join(root, f"IJRR-Dataset-{seq}")
        self.down_dir = osp.join(root, "downsampled_xyzi", f"{seq:02d}")
        if not osp.isdir(self.down_dir) and osp.isdir(raw):
            self.down_dir = osp.join(raw, "downsampled")
        self.pose_path = osp.join(root, "sequences", f"{seq:02d}", "poses.txt")
        if not osp.exists(self.pose_path) and osp.exists(osp.join(raw, "poses.txt")):
            self.pose_path = osp.join(raw, "poses.txt")
        self.scan_dir = osp.join(raw, "velodyne")
        self.source = _bin_source(self.scan_dir, voxel_size, "{idx:06d}.bin", self.down_dir)

    def poses(self) -> np.ndarray:
        return _kitti_row_poses(self.pose_path)

    def __call__(self, idx: int) -> np.ndarray:
        return self.source(idx)


class ApolloSequence:
    """Apollo-SouthBay, reference prepared-tree layout first: scans from
    `downsampled_xyzi/%02d/%06d.npy` with integer sequences 1-4 (reference
    `datasets/registration/apollo/dataset.py:104-112`; GT transforms ride
    the pair text, but a KITTI-style `sequences/%02d/poses.txt` is also
    honored for pair generation).  A non-integer `seq` selects the legacy
    raw-session layout (`<session>/pcds/%06d.bin` + `poses/gt_poses.txt`)."""

    def __init__(self, root: str, seq, voxel_size: float = 0.3):
        try:
            iseq: Optional[int] = int(seq)
        except (TypeError, ValueError):
            iseq = None
        if iseq is not None:
            self.down_dir = osp.join(root, "downsampled_xyzi", f"{iseq:02d}")
            self.scan_dir = osp.join(root, "sequences", f"{iseq:02d}", "velodyne")
            self.pose_path = osp.join(root, "sequences", f"{iseq:02d}", "poses.txt")
        else:
            session = str(seq)
            self.scan_dir = osp.join(root, session, "pcds")
            self.down_dir = osp.join(root, session, "downsampled")
            self.pose_path = osp.join(root, session, "poses", "gt_poses.txt")
        self.source = _bin_source(self.scan_dir, voxel_size, "{idx:06d}.bin", self.down_dir)

    def poses(self) -> np.ndarray:
        return _kitti_row_poses(self.pose_path)

    def __call__(self, idx: int) -> np.ndarray:
        return self.source(idx)


class MulranSequence:
    """MulRan, reference layout: scans from `downsampled_xyzi/<seq>/<stamp>.npy`
    (UNPADDED timestamp names — `datasets/registration/mulran/dataset.py:111`),
    poses from `mulran/<seq>/sensor_data/poses_in_kitti_format.txt`; pose row
    i belongs to the i-th sorted Ouster bin timestamp
    (`datasets/utils/mulran.py:29-60`).  When the raw Ouster tree is absent
    the timestamps are enumerated from the prepared npy names instead."""

    def __init__(self, root: str, seq: str, voxel_size: float = 0.3):
        self.seq_dir = osp.join(root, "mulran", seq, "sensor_data")
        self.scan_dir = osp.join(self.seq_dir, "Ouster")
        self.down_dir = osp.join(root, "downsampled_xyzi", seq)
        self.legacy_down_dir = osp.join(self.seq_dir, "downsampled")
        self.pose_path = osp.join(self.seq_dir, "poses_in_kitti_format.txt")
        self.voxel_size = voxel_size
        names = glob.glob(osp.join(self.scan_dir, "*.bin"))
        if not names:  # prepared tree only: stamps from the npy names
            names = glob.glob(osp.join(self.down_dir, "*.npy"))
        self.stamps = sorted(
            int(osp.splitext(osp.basename(n))[0]) for n in names
        )

    def poses(self) -> np.ndarray:
        return _kitti_row_poses(self.pose_path)

    def __call__(self, idx: int) -> np.ndarray:
        """idx is the sequential frame number; scans are timestamp-named."""
        stamp = self.stamps[idx] if idx < len(self.stamps) else idx
        for d in (self.down_dir, self.legacy_down_dir):
            npy = osp.join(d, f"{stamp}.npy")
            if osp.exists(npy):
                return np.ascontiguousarray(np.load(npy)[:, :3], np.float32)
        pts = load_kitti_bin_native(osp.join(self.scan_dir, f"{stamp}.bin"))
        return voxel_downsample(pts, self.voxel_size)


def count_frames(source) -> int:
    """Number of frames a sequence scan source can serve (max over its
    downsampled-npy and raw-bin directories; MulRan counts timestamps)."""
    if hasattr(source, "stamps"):
        return len(source.stamps)
    counts = [0]
    for attr in ("down_dir", "scan_dir", "bin_dir"):
        d = getattr(source, attr, None)
        if d and osp.isdir(d):
            counts.append(
                len([f for f in os.listdir(d) if f.endswith((".npy", ".bin", ".pcd"))])
            )
    return max(counts)


def make_sequence(family: str, root: str, seq, voxel_size: float = 0.3):
    """Factory over all supported dataset families."""
    if family == "kitti":
        from lcrnet_tpu.data.kitti import KittiScanSource

        return KittiScanSource(root, int(seq), voxel_size)
    if family == "kitti360":
        return Kitti360Sequence(root, int(seq), voxel_size)
    if family == "ford":
        return FordSequence(root, int(seq), voxel_size)
    if family == "apollo":
        return ApolloSequence(root, str(seq), voxel_size)
    if family == "mulran":
        return MulranSequence(root, str(seq), voxel_size)
    raise ValueError(f"unknown dataset family {family}")

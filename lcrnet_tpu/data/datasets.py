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


class FordSequence:
    """Ford Campus: per-scan bins + a flat pose text (reference
    `datasets/utils/ford.py`)."""

    def __init__(self, root: str, seq: int, voxel_size: float = 0.3):
        self.scan_dir = osp.join(root, f"IJRR-Dataset-{seq}", "velodyne")
        self.down_dir = osp.join(root, f"IJRR-Dataset-{seq}", "downsampled")
        self.pose_path = osp.join(root, f"IJRR-Dataset-{seq}", "poses.txt")
        self.source = _bin_source(self.scan_dir, voxel_size, "{idx:06d}.bin", self.down_dir)

    def poses(self) -> np.ndarray:
        raw = np.loadtxt(self.pose_path)
        poses = np.tile(np.eye(4), (len(raw), 1, 1))
        poses[:, :3, :4] = raw[:, -12:].reshape(-1, 3, 4)
        return poses

    def __call__(self, idx: int) -> np.ndarray:
        return self.source(idx)


class ApolloSequence:
    """Apollo-SouthBay: session dirs with `pcds` + poses (reference
    `datasets/registration/apollo/dataset.py`)."""

    def __init__(self, root: str, session: str, voxel_size: float = 0.3):
        self.scan_dir = osp.join(root, session, "pcds")
        self.down_dir = osp.join(root, session, "downsampled")
        self.pose_path = osp.join(root, session, "poses", "gt_poses.txt")
        self.source = _bin_source(self.scan_dir, voxel_size, "{idx:06d}.bin", self.down_dir)

    def poses(self) -> np.ndarray:
        raw = np.loadtxt(self.pose_path)
        poses = np.tile(np.eye(4), (len(raw), 1, 1))
        poses[:, :3, :4] = raw[:, -12:].reshape(-1, 3, 4)
        return poses

    def __call__(self, idx: int) -> np.ndarray:
        return self.source(idx)


class MulranSequence:
    """MulRan: Ouster bins named by timestamp, poses in KITTI-format rows
    (reference `datasets/utils/mulran.py`)."""

    def __init__(self, root: str, seq: str, voxel_size: float = 0.3):
        self.seq_dir = osp.join(root, "mulran", seq, "sensor_data")
        self.scan_dir = osp.join(self.seq_dir, "Ouster")
        self.down_dir = osp.join(self.seq_dir, "downsampled")
        self.pose_path = osp.join(self.seq_dir, "poses_in_kitti_format.txt")
        self.voxel_size = voxel_size
        names = glob.glob(osp.join(self.scan_dir, "*.bin"))
        self.stamps = sorted(int(osp.basename(n)[:-4]) for n in names)

    def poses(self) -> np.ndarray:
        raw = np.loadtxt(self.pose_path)
        poses = np.tile(np.eye(4), (len(raw), 1, 1))
        poses[:, :3, :4] = raw[:, :12].reshape(-1, 3, 4)
        return poses

    def __call__(self, idx: int) -> np.ndarray:
        """idx is the sequential frame number; scans are timestamp-named."""
        stamp = self.stamps[idx] if idx < len(self.stamps) else idx
        npy = osp.join(self.down_dir, f"{stamp}.npy")
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

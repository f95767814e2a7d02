"""KITTI odometry dataset utilities.

Parity targets:
  - `experiments/lcrnet/datasets/utils/kitti.py:5-130` (pair-text/npz
    parsers, GT pose loading with velo<->cam0 conjugation)
  - `experiments/lcrnet/datasets/loop_closure/kitti/dataset.py:17-197`
    (sequence splits, downsampled-scan loading, yaw-only augmentation)
  - `data/Kitti/downsample_pcd.py:9-46` (offline 0.3 m voxel downsample)

Host-side numpy only — device work happens in the jitted step.
"""

from __future__ import annotations

import os
import os.path as osp
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

# canonical sequence splits (reference `datasets/loop_closure/kitti/dataset.py:17-27`)
TRAIN_SEQS = [5, 6, 7, 9]
VAL_SEQS = [2]
TEST_SEQS = [0]
INFER_SEQS = [8]
LOOP_DET_TRAIN_SEQS = [3, 4, 5, 6, 7, 8, 9]


def load_scan_npy(path: str) -> np.ndarray:
    """Load a downsampled scan saved as (N, 3|4) npy; returns xyz (N, 3)."""
    arr = np.load(path)
    return np.ascontiguousarray(arr[:, :3], dtype=np.float32)


def load_scan_bin(path: str) -> np.ndarray:
    """Raw KITTI velodyne .bin -> xyz (N, 3)."""
    pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return np.ascontiguousarray(pts[:, :3])


def voxel_downsample(points: np.ndarray, voxel_size: float = 0.3) -> np.ndarray:
    """Offline voxel-barycenter downsample (same semantics as the C++
    extension / open3d path in `data/Kitti/downsample_pcd.py`)."""
    origin = np.floor(points.min(axis=0) / voxel_size) * voxel_size
    ijk = np.floor((points - origin) / voxel_size).astype(np.int64)
    n = ijk.max(axis=0) + 1
    ids = ijk[:, 0] + n[0] * ijk[:, 1] + n[0] * n[1] * ijk[:, 2]
    order = np.argsort(ids, kind="stable")
    sids = ids[order]
    spts = points[order]
    boundaries = np.concatenate([[0], np.nonzero(np.diff(sids))[0] + 1, [len(sids)]])
    out = np.add.reduceat(spts, boundaries[:-1], axis=0)
    counts = np.diff(boundaries)[:, None]
    return (out / counts).astype(np.float32)


def load_kitti_calib(calib_path: str) -> np.ndarray:
    """Tr (velo -> cam0) 4x4 from calib.txt."""
    with open(calib_path) as f:
        for line in f:
            if line.startswith("Tr"):
                vals = np.array(line.split(":")[1].split(), dtype=np.float64)
                tr = np.eye(4)
                tr[:3, :4] = vals.reshape(3, 4)
                return tr
    raise ValueError(f"no Tr line in {calib_path}")


def load_kitti_gt_pose(pose_path: str, calib_path: Optional[str] = None) -> np.ndarray:
    """Per-frame poses (N, 4, 4) in the velodyne frame.

    The published KITTI poses are cam0 poses; the reference conjugates with
    the velo->cam calibration (`datasets/utils/kitti.py:97`):
    T_velo = Tr^-1 @ T_cam @ Tr.
    """
    raw = np.loadtxt(pose_path).reshape(-1, 3, 4)
    poses = np.tile(np.eye(4), (len(raw), 1, 1))
    poses[:, :3, :4] = raw
    if calib_path is not None:
        tr = load_kitti_calib(calib_path)
        inv = np.linalg.inv(tr)
        poses = inv[None] @ poses @ tr[None]
    return poses.astype(np.float64)


def relative_transform(pose_ref: np.ndarray, pose_src: np.ndarray) -> np.ndarray:
    """GT transform mapping src-frame points into the ref frame."""
    return (np.linalg.inv(pose_ref) @ pose_src).astype(np.float32)


def load_pair_text(path: str) -> List[Dict]:
    """Registration pair text: each line `anc pos r00 r01 r02 t0 ... r23`
    (reference `datasets/utils/kitti.py` `load_kitti_gt_pair_registration`)."""
    pairs = []
    data = np.loadtxt(path).reshape(-1, 14)
    for row in data:
        t = np.eye(4, dtype=np.float32)
        t[:3, :4] = row[2:].reshape(3, 4)
        pairs.append({"anc_idx": int(row[0]), "pos_idx": int(row[1]), "transform": t})
    return pairs


def load_pair_npz(path: str) -> List[Dict]:
    """Loop pair npz with fields anc_idx/pos_idx/trans arrays."""
    d = np.load(path, allow_pickle=True)
    pairs = []
    anc = d["anc_idx"] if "anc_idx" in d else d[d.files[0]]
    pos = d["pos_idx"] if "pos_idx" in d else d[d.files[1]]
    trans = d["trans"] if "trans" in d else None
    for i in range(len(anc)):
        t = np.asarray(trans[i], np.float32).reshape(4, 4) if trans is not None else np.eye(4, np.float32)
        pairs.append({"anc_idx": int(anc[i]), "pos_idx": int(pos[i]), "transform": t})
    return pairs


def load_pair_npz_mixed(path: str, frames: Optional[set] = None) -> List[Dict]:
    """Parse the reference's row-of-dicts pair npz (`mixed/SS.npz` and the
    distance-loop npz family, reference `generate_kitti_pairs_mixed.py:155`):
    a single `data` object array whose entries are
    `{'seq_id', 'anc_idx', 'pos_idx': (k,), 'pose': (k, 4, 4)}` — each pose
    maps anc-frame points into the matching pos frame (pos = ref scan).

    Returns flat per-pair dicts; `frames` (if given) keeps only pairs whose
    both endpoints are in the set.
    """
    rows = np.load(path, allow_pickle=True)["data"]
    pairs: List[Dict] = []
    for r in rows:
        anc = int(r["anc_idx"])
        if frames is not None and anc not in frames:
            continue
        poss = np.atleast_1d(np.asarray(r["pos_idx"])).astype(int)
        ts = np.asarray(r["pose"], np.float32).reshape(-1, 4, 4)
        for k, p in enumerate(poss):
            if frames is None or int(p) in frames:
                pairs.append({
                    "seq_id": int(r.get("seq_id", 0)),
                    "anc_idx": anc,
                    "pos_idx": int(p),
                    "transform": ts[k],
                })
    return pairs


def yaw_rotation(angle: float) -> np.ndarray:
    c, s = np.cos(angle), np.sin(angle)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)


@dataclass
class AugmentConfig:
    """Pair augmentation knobs (reference `datasets/loop_closure/kitti/
    dataset.py:114-143` + `config_reg.py:42-47`): yaw rotation, uniform
    noise, uniform scale, per-cloud shift."""

    rotation: float = 1.0       # fraction of 2*pi
    noise: float = 0.01
    min_scale: float = 0.8
    max_scale: float = 1.2
    shift: float = 2.0


def augment_pair(
    ref_points: np.ndarray,
    src_points: np.ndarray,
    transform: np.ndarray,
    rng: np.random.Generator,
    cfg: AugmentConfig,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Augment a pair with the reference recipe
    (`datasets/loop_closure/kitti/dataset.py:114-143` _augment_point_cloud):
    uniform jitter on both clouds, yaw-rotate one side (coin flip, updating
    the GT transform), uniform scale on both clouds + translation, then an
    independent uniform shift per cloud folded into the translation."""
    # uniform noise (reference uses (rand - 0.5) * noise, NOT gaussian)
    ref_points = ref_points + (rng.random(ref_points.shape) - 0.5).astype(np.float32) * cfg.noise
    src_points = src_points + (rng.random(src_points.shape) - 0.5).astype(np.float32) * cfg.noise

    # yaw rotation of one side
    aug_rot = yaw_rotation(rng.uniform(0, 2 * np.pi * cfg.rotation))
    rot = transform[:3, :3].copy()
    trans = transform[:3, 3].copy()
    if rng.uniform() > 0.5:
        ref_points = ref_points @ aug_rot.T
        rot = aug_rot @ rot
        trans = aug_rot @ trans
    else:
        src_points = src_points @ aug_rot.T
        rot = rot @ aug_rot.T

    # uniform scale on both clouds; the translation scales with the geometry
    scale = rng.uniform(cfg.min_scale, cfg.max_scale)
    ref_points = ref_points * scale
    src_points = src_points * scale
    trans = trans * scale

    # independent shift per cloud: ref' = R @ (src' - src_shift) + t + ref_shift
    ref_shift = rng.uniform(-cfg.shift, cfg.shift, 3).astype(np.float32)
    src_shift = rng.uniform(-cfg.shift, cfg.shift, 3).astype(np.float32)
    ref_points = ref_points + ref_shift
    src_points = src_points + src_shift
    trans = -(rot @ src_shift) + trans + ref_shift

    t = np.eye(4, dtype=np.float32)
    t[:3, :3] = rot
    t[:3, 3] = trans
    return ref_points.astype(np.float32), src_points.astype(np.float32), t


def pad_points(points: np.ndarray, capacity: int, point_limit: Optional[int] = None,
               rng: Optional[np.random.Generator] = None) -> Tuple[np.ndarray, np.ndarray]:
    """Cap (random subsample, reference `dataset.py` point_limit) and pad to
    the static capacity with PAD coordinates + mask."""
    n = len(points)
    limit = min(capacity, point_limit) if point_limit else capacity
    if n > limit:
        if rng is not None:
            sel = rng.choice(n, limit, replace=False)
        else:
            sel = np.linspace(0, n - 1, limit).astype(np.int64)
        points = points[sel]
        n = limit
    out = np.full((capacity, 3), 1.0e6, np.float32)
    out[:n] = points
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    return out, mask


class KittiScanSource:
    """Scan provider over a KITTI-odometry-style directory tree.

    Supports both raw `velodyne/*.bin` (downsampled on the fly) and
    pre-downsampled `downsampled_xyzi/*.npy` layouts.
    """

    def __init__(self, root: str, seq: int, voxel_size: float = 0.3):
        self.root = root
        self.seq = seq
        self.voxel_size = voxel_size
        self.down_dir = osp.join(root, "downsampled_xyzi", f"{seq:02d}")
        self.bin_dir = osp.join(root, "sequences", f"{seq:02d}", "velodyne")

    def __call__(self, idx: int) -> np.ndarray:
        npy = osp.join(self.down_dir, f"{idx:06d}.npy")
        if osp.exists(npy):
            return load_scan_npy(npy)
        binf = osp.join(self.bin_dir, f"{idx:06d}.bin")
        return voxel_downsample(load_scan_bin(binf), self.voxel_size)

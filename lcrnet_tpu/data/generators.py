"""Offline ground-truth pair generation.

Parity targets (`/root/reference/data/*`, SURVEY.md §2.5):
  - `data/Kitti/downsample_pcd.py:9-46` — 0.3 m voxel downsample of raw
    velodyne scans into npy files
  - `data/Kitti/generate_kitti_pairs.py:12-182` — continuous registration
    pairs: consecutive frames > 10 m apart, GT from odometry poses refined
    by ICP
  - `data/Kitti/generate_kitti_loop_pairs.py` — loop pairs: frame pairs
    < 4 m apart with >= 100-frame index gap
  - overlap-based loop GT (overlap > 0.3) for retrieval evaluation

open3d is not available here; the ICP refinement is our own
point-to-point ICP built on the native cell-list neighbor search + the
device Procrustes solver.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Callable, List, Optional, Tuple

import numpy as np

from lcrnet_tpu.data.kitti import relative_transform, voxel_downsample
from lcrnet_tpu.native.host_ops import radius_neighbors_native
from lcrnet_tpu.utils.metrics import apply_transform_np


def downsample_sequence(
    bin_dir: str, out_dir: str, voxel_size: float = 0.3, limit: Optional[int] = None
):
    """Voxel-downsample every scan of a sequence into npy files
    (reference `downsample_pcd.py`)."""
    from lcrnet_tpu.native.host_ops import load_kitti_bin_native

    os.makedirs(out_dir, exist_ok=True)
    files = sorted(f for f in os.listdir(bin_dir) if f.endswith(".bin"))
    if limit:
        files = files[:limit]
    for f in files:
        pts = load_kitti_bin_native(osp.join(bin_dir, f))
        down = voxel_downsample(pts, voxel_size)
        np.save(osp.join(out_dir, f.replace(".bin", ".npy")), down.astype(np.float32))
    return len(files)


def icp_refine(
    src: np.ndarray,
    ref: np.ndarray,
    init_transform: np.ndarray,
    max_corr_dist: float = 0.5,
    iterations: int = 20,
) -> np.ndarray:
    """Point-to-point ICP: refine src->ref starting from init_transform.

    Replaces the reference's open3d `registration_icp` in pair generation.
    """
    import jax.numpy as jnp

    from lcrnet_tpu.ops.procrustes import weighted_procrustes

    transform = init_transform.astype(np.float64).copy()
    for _ in range(iterations):
        moved = apply_transform_np(src, transform)
        idx, counts = radius_neighbors_native(moved, ref, max_corr_dist, 1)
        valid = counts > 0
        if valid.sum() < 10:
            break
        pairs_src = src[valid]
        pairs_ref = ref[idx[valid, 0]]
        new_t = np.asarray(
            weighted_procrustes(jnp.asarray(pairs_src, jnp.float32), jnp.asarray(pairs_ref, jnp.float32))
        ).astype(np.float64)
        if np.allclose(new_t, transform, atol=1e-7):
            transform = new_t
            break
        transform = new_t
    return transform.astype(np.float32)


def generate_registration_pairs(
    poses: np.ndarray,
    scan_source: Optional[Callable[[int], np.ndarray]] = None,
    min_distance: float = 10.0,
    refine: bool = False,
) -> List[dict]:
    """Consecutive pairs with > min_distance travel (reference
    `generate_kitti_pairs.py`): walk the trajectory, emit (anc=i, pos=j)
    where j is the first later frame farther than min_distance."""
    positions = poses[:, :3, 3]
    finite = np.isfinite(positions).all(axis=1)
    pairs = []
    i = 0
    n = len(poses)
    while i < n:
        if not finite[i]:
            i += 1
            continue
        j = i + 1
        while j < n and not (
            finite[j] and np.linalg.norm(positions[j] - positions[i]) > min_distance
        ):
            j += 1
        if j >= n:
            break
        # reference semantics (`generate_kitti_pairs.py`): the emitted pos is
        # the frame BEFORE the first one farther than min_distance (`next_time
        # = where(more_than_10)[0] + curr - 1`) — pair distance just under the
        # threshold, not just over
        j = j - 1 if (j - 1 > i and finite[j - 1]) else j
        t = relative_transform(poses[j], poses[i])  # src=i into frame of ref=j
        if refine and scan_source is not None:
            t = icp_refine(scan_source(i), scan_source(j), t)
        pairs.append({"anc_idx": i, "pos_idx": j, "transform": t})
        i = j
    return pairs


def generate_loop_pairs(
    poses: np.ndarray,
    max_distance: float = 4.0,
    min_index_gap: int = 100,
    scan_source: Optional[Callable[[int], np.ndarray]] = None,
    refine: bool = False,
) -> List[dict]:
    """Loop-closure pairs: spatially close (< max_distance) revisits with a
    temporal gap (reference `generate_kitti_loop_pairs.py`)."""
    positions = poses[:, :3, 3]
    pairs = []
    for i in range(len(poses)):
        earlier = positions[: max(i - min_index_gap, 0)]
        if len(earlier) == 0:
            continue
        d = np.linalg.norm(earlier - positions[i], axis=1)
        j = int(np.argmin(d))
        if d[j] < max_distance:
            t = relative_transform(poses[j], poses[i])
            if refine and scan_source is not None:
                t = icp_refine(scan_source(i), scan_source(j), t)
            pairs.append({"anc_idx": i, "pos_idx": j, "transform": t})
    return pairs


def generate_loop_rows(
    poses: np.ndarray,
    max_distance: float = 4.0,
    lag: int = 50,
    start: int = 100,
    seq_id: int = 0,
) -> List[dict]:
    """Distance-loop GT rows in the reference's row-of-dicts schema
    (`generate_kitti_loop_pairs.py::generate_kitti_loop_pairs_distance_npz`):
    for each frame i >= `start`, every frame j <= i - `lag` within
    `max_distance` becomes a positive, pose = inv(poses[j]) @ poses[i]
    (anchor points into the pos frame)."""
    positions = poses[:, :3, 3]
    rows = []
    for i in range(start, len(poses)):
        cand = positions[: max(i - lag + 1, 0)]
        if len(cand) == 0:
            continue
        d = np.linalg.norm(cand - positions[i], axis=1)
        js = np.nonzero(d < max_distance)[0]
        if len(js) == 0:
            continue
        rel = np.stack([relative_transform(poses[j], poses[i]) for j in js])
        rows.append({"seq_id": seq_id, "anc_idx": i,
                     "pos_idx": js.astype(np.int64), "pose": rel.astype(np.float64)})
    return rows


def generate_mixed_rows(
    poses: np.ndarray,
    anchor_min_distance: float = 10.0,
    window: int = 100,
    pos_min_distance: float = 1.0,
    pos_max_distance: float = 15.0,
    loop_max_distance: float = 10.0,
    seq_id: int = 0,
) -> List[dict]:
    """The reference's "mixed" GT rows (`generate_kitti_pairs_mixed.py::
    prepare_kitti_pairs`): walk the trajectory emitting, per anchor, every
    frame in the next `window` frames at (pos_min, pos_max) distance, then
    advance to the first frame > `anchor_min_distance` away; append the
    distance-loop rows (reference appends
    `generate_kitti_loop_pairs_distance_npz(seq, root, 10., True)`).

    Deviation: the reference does not advance the anchor when a window has
    a far frame but no (1, 15) m frames, which would loop forever; we
    advance by one frame in that case.
    """
    positions = poses[:, :3, 3]
    n = len(poses)
    rows = []
    curr = 0
    while curr < n:
        window_d = np.linalg.norm(
            positions[curr : curr + window] - positions[curr], axis=1
        )
        far = np.nonzero(window_d > anchor_min_distance)[0]
        if len(far) == 0:
            curr += 1
            continue
        next_time = far[0] + curr - 1  # reference keeps the -1 overlap
        cal = np.nonzero(
            (window_d > pos_min_distance) & (window_d < pos_max_distance)
        )[0] + curr
        if len(cal) > 0:
            rel = np.stack([relative_transform(poses[j], poses[curr]) for j in cal])
            rows.append({"seq_id": seq_id, "anc_idx": curr,
                         "pos_idx": cal.astype(np.int64), "pose": rel.astype(np.float64)})
            curr = max(next_time, curr + 1)
        else:
            curr += 1  # deviation: reference would spin here
    rows.extend(generate_loop_rows(poses, loop_max_distance, seq_id=seq_id))
    return rows


def write_pairs_text(path: str, pairs: List[dict]) -> None:
    """Write flat pairs in the reference's registration text format
    (`icp10/SS`: lines `anc pos r00 r01 r02 t0 ... r23`) — round-trips
    through `data/kitti.py::load_pair_text`."""
    lines = []
    for p in pairs:
        row = [str(p["anc_idx"]), str(p["pos_idx"])]
        row += [repr(float(v)) for v in np.asarray(p["transform"])[:3, :4].reshape(-1)]
        lines.append(" ".join(row))
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")


def write_pairs_npz(path: str, rows: List[dict]) -> None:
    """Write GT rows in the reference's on-disk schema (one `data` object
    array of per-anchor dicts) — round-trips through
    `data/kitti.py::load_pair_npz_mixed`."""
    arr = np.empty(len(rows), dtype=object)
    for i, r in enumerate(rows):
        arr[i] = r
    np.savez_compressed(path, data=arr)


def scan_overlap(
    ref: np.ndarray, src: np.ndarray, transform: np.ndarray, radius: float = 0.5
) -> float:
    """Fraction of src points with a ref point within radius after alignment
    (the overlap measure behind the retrieval GT, overlap > 0.3)."""
    moved = apply_transform_np(src, transform)
    _, counts = radius_neighbors_native(moved, ref, radius, 1)
    return float(np.mean(counts > 0))


def generate_overlap_loop_gt(
    poses: np.ndarray,
    scan_source: Callable[[int], np.ndarray],
    overlap_threshold: float = 0.3,
    coarse_distance: float = 15.0,
    min_index_gap: int = 100,
) -> List[List[int]]:
    """Per-frame lists of loop frames with scan overlap > threshold
    (retrieval ground truth; reference `loop_gt_seq00_0.3overlap` npz)."""
    positions = poses[:, :3, 3]
    n = len(poses)
    gt: List[List[int]] = [[] for _ in range(n)]
    cache = {}

    def get(i):
        if i not in cache:
            cache[i] = scan_source(i)
        return cache[i]

    for i in range(n):
        earlier = positions[: max(i - min_index_gap, 0)]
        if len(earlier) == 0:
            continue
        d = np.linalg.norm(earlier - positions[i], axis=1)
        for j in np.nonzero(d < coarse_distance)[0]:
            t = relative_transform(poses[j], poses[i])
            if scan_overlap(get(int(j)), get(i), t) > overlap_threshold:
                gt[i].append(int(j))
    return gt


def write_overlap_gt(path: str, gt: List[List[int]]) -> None:
    """Write retrieval GT in the reference's on-disk format
    (`loop_gt_seq00_0.3overlap_inactive.npz`: one unnamed object array of
    length n_frames, entry i = float array of positive frame indices).
    Round-trips through `experiments/test_loop_detection.py::load_overlap_gt`.
    """
    arr = np.empty(len(gt), dtype=object)
    for i, positives in enumerate(gt):
        arr[i] = np.asarray(positives, dtype=np.float64)
    np.savez(path, arr)


def generate_training_tuples(
    poses: np.ndarray,
    overlap_gt: List[List[int]],
    num_neg_store: int = 18,
    neg_min_distance: float = 15.0,
    seed: int = 7351,
) -> dict:
    """(anchor, positives, negatives) training tuples from overlap GT.

    Mirrors the reference's LD training metadata
    (`datasets/loop_detection/kitti/dataset_overlap_online.py:187-210`:
    anchors with `positive_idxs` from the overlap GT; `negative_idxs`
    sampled from frames outside the positive set — here additionally
    required to be > `neg_min_distance` away so negatives are true
    non-revisits, not merely unlabeled neighbors).  NaN-gap poses
    (KITTI-360 skipped frames) are never anchors, positives, or negatives.

    Returns npz-ready dict of object arrays: anc_idx, pos_idx, neg_idx.
    """
    rng = np.random.default_rng(seed)
    positions = poses[:, :3, 3]
    valid = np.isfinite(positions).all(axis=1)
    anc, pos, neg = [], [], []
    for i, positives in enumerate(overlap_gt):
        if not positives or not valid[i]:
            continue
        positives = [j for j in positives if valid[j]]
        if not positives:
            continue
        d = np.linalg.norm(positions - positions[i], axis=1)
        far = np.nonzero((d > neg_min_distance) & valid)[0]
        far = far[~np.isin(far, positives)]
        if len(far) == 0:
            continue
        take = min(num_neg_store, len(far))
        anc.append(i)
        pos.append(np.asarray(positives, np.int64))
        neg.append(np.sort(rng.choice(far, size=take, replace=False)))
    return {
        "anc_idx": np.asarray(anc, np.int64),
        "pos_idx": np.array(pos, dtype=object),
        "neg_idx": np.array(neg, dtype=object),
    }


def write_training_tuples(path: str, tuples: dict) -> None:
    """Write tuples in `experiments/train_loop_detection.py`'s npz schema."""
    np.savez(path, **tuples)

#!/usr/bin/env python
"""Offline GT generation CLI — the reference's `data/*/generate_*.py` and
`downsample_pcd.py` scripts behind one entry point.

Given a dataset tree and its poses, produces any of:
  downsample     0.3 m voxel-downsampled per-scan npy files
                 (`data/Kitti/downsample_pcd.py:9-46`)
  registration   continuous pairs > 10 m apart, text format `icpD/SS`
                 (`data/Kitti/generate_kitti_pairs.py:12-182`), optional
                 native-ICP refinement
  loop           distance-loop rows (< 4 m revisits, 50-frame lag) in the
                 reference npz row schema
                 (`data/Kitti/generate_kitti_loop_pairs.py:8-46`)
  mixed          registration-walk rows + 10 m loop rows -> `mixed/SS.npz`
                 (`data/Kitti/generate_kitti_pairs_mixed.py:70-168`)
  overlap        retrieval GT: per-frame loop lists with scan overlap > 0.3
                 (`loop_gt_seqSS_0.3overlap_inactive.npz` family)

Poses: KITTI odometry publishes cam0 poses; pass --calib_file to conjugate
into the velodyne frame (`datasets/utils/kitti.py:97`). Non-KITTI families
read poses through their sequence classes (`lcrnet_tpu/data/datasets.py`).
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--family", default="kitti",
                    choices=["kitti", "kitti360", "ford", "apollo", "mulran"])
    ap.add_argument("--seq", default="0", help="sequence id (int or session name)")
    ap.add_argument("--tasks", default="registration,loop,mixed,overlap",
                    help="comma list of downsample,registration,loop,mixed,"
                         "overlap,tuples (tuples = LD training anchors/"
                         "positives/negatives mined from the overlap GT)")
    ap.add_argument("--pose_file", default=None,
                    help="kitti family: poses.txt (cam0 or velo frame)")
    ap.add_argument("--calib_file", default=None,
                    help="kitti family: calib.txt for velo<->cam0 conjugation")
    ap.add_argument("--bin_dir", default=None,
                    help="downsample task: directory of raw velodyne .bin scans")
    ap.add_argument("--out_dir", default=None, help="default: dataset_root")
    ap.add_argument("--voxel_size", type=float, default=0.3)
    ap.add_argument("--min_distance", type=float, default=10.0,
                    help="registration/mixed anchor spacing (m)")
    ap.add_argument("--loop_distance", type=float, default=4.0)
    ap.add_argument("--overlap_threshold", type=float, default=0.3)
    ap.add_argument("--gt_max_points", type=int, default=0,
                    help="subsample scans to this many points for the "
                         "overlap-GT computation (0 = full scans)")
    ap.add_argument("--refine", action="store_true",
                    help="ICP-refine registration-pair transforms (native ICP)")
    ap.add_argument("--limit", type=int, default=None,
                    help="cap the number of frames considered")
    args = ap.parse_args()

    from lcrnet_tpu.data.generators import (
        downsample_sequence,
        generate_loop_rows,
        generate_mixed_rows,
        generate_overlap_loop_gt,
        generate_registration_pairs,
        write_overlap_gt,
        write_pairs_npz,
        write_pairs_text,
    )

    tasks = {t.strip() for t in args.tasks.split(",") if t.strip()}
    out_dir = args.out_dir or args.dataset_root
    os.makedirs(out_dir, exist_ok=True)
    seq_tag = f"{int(args.seq):02d}" if str(args.seq).isdigit() else str(args.seq)

    if "downsample" in tasks:
        assert args.bin_dir, "--bin_dir required for the downsample task"
        dst = osp.join(out_dir, "downsampled_xyzi", seq_tag)
        n = downsample_sequence(args.bin_dir, dst, args.voxel_size, limit=args.limit)
        print(f"downsampled {n} scans -> {dst}")

    needs_poses = tasks - {"downsample"}
    if not needs_poses:
        return

    if args.family == "kitti":
        from lcrnet_tpu.data.kitti import KittiScanSource, load_kitti_gt_pose

        assert args.pose_file, "--pose_file required for kitti pair generation"
        poses = load_kitti_gt_pose(args.pose_file, args.calib_file)
        scan_source = KittiScanSource(args.dataset_root, int(args.seq), args.voxel_size)
    else:
        from lcrnet_tpu.data.datasets import make_sequence

        seqc = make_sequence(args.family, args.dataset_root, args.seq, args.voxel_size)
        poses = seqc.poses()
        scan_source = seqc
    if args.limit:
        poses = poses[: args.limit]
    print(f"{args.family} seq {seq_tag}: {len(poses)} poses")

    if "registration" in tasks:
        pairs = generate_registration_pairs(
            poses, scan_source if args.refine else None,
            min_distance=args.min_distance, refine=args.refine)
        dst = osp.join(out_dir, f"icp{int(args.min_distance)}")
        os.makedirs(dst, exist_ok=True)
        write_pairs_text(osp.join(dst, seq_tag), pairs)
        print(f"registration: {len(pairs)} pairs -> {osp.join(dst, seq_tag)}")

    seq_id = int(args.seq) if str(args.seq).isdigit() else 0
    if "loop" in tasks:
        rows = generate_loop_rows(poses, args.loop_distance, seq_id=seq_id)
        dst = osp.join(out_dir, f"loop_distance{int(args.loop_distance)}")
        os.makedirs(dst, exist_ok=True)
        path = osp.join(dst, f"{seq_tag}.npz")
        write_pairs_npz(path, rows)
        print(f"loop: {len(rows)} anchor rows -> {path}")

    if "mixed" in tasks:
        rows = generate_mixed_rows(
            poses, anchor_min_distance=args.min_distance, seq_id=seq_id)
        dst = osp.join(out_dir, "mixed")
        os.makedirs(dst, exist_ok=True)
        path = osp.join(dst, f"{seq_tag}.npz")
        write_pairs_npz(path, rows)
        print(f"mixed: {len(rows)} anchor rows -> {path}")

    if "overlap" in tasks or "tuples" in tasks:
        overlap_source = scan_source
        if args.gt_max_points:
            # overlap is a mean over src points with a ref neighbor: a
            # uniform subsample estimates the same fraction (stderr
            # ~sqrt(p(1-p)/n) ~ 0.007 at n=4096) while cutting the O(N)
            # neighbor queries — at sequence scale (thousands of frames,
            # tens of thousands of candidate pairs) this is the difference
            # between minutes and hours on one host core
            import numpy as _np

            def overlap_source(i, _src=scan_source, _cap=int(args.gt_max_points)):
                pts = _src(i)
                if len(pts) > _cap:
                    sel = _np.random.default_rng(i).choice(
                        len(pts), _cap, replace=False)
                    pts = pts[sel]
                return pts

        gt = generate_overlap_loop_gt(
            poses, overlap_source, overlap_threshold=args.overlap_threshold)
        if "overlap" in tasks:
            path = osp.join(
                out_dir, f"loop_gt_seq{seq_tag}_{args.overlap_threshold}overlap.npz")
            write_overlap_gt(path, gt)
            print(f"overlap GT: {sum(map(len, gt))} positives over {len(gt)} frames -> {path}")
        if "tuples" in tasks:
            from lcrnet_tpu.data.generators import (
                generate_training_tuples,
                write_training_tuples,
            )

            tuples = generate_training_tuples(poses, gt)
            path = osp.join(out_dir, f"training_tuples_seq{seq_tag}.npz")
            write_training_tuples(path, tuples)
            print(f"training tuples: {len(tuples['anc_idx'])} anchors -> {path}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Synthesize a multi-hundred-frame LiDAR sequence with planted revisits.

Builds a synthetic "world" by placing the six real KITTI-00 scans shipped in
the image (`/root/reference/demo/data_demo`) at separated sites, drives a
trajectory through them — two laps around the ring (the second laterally
offset and optionally direction-reversed, the KITTI-360 reverse-loop
stress) plus a one-shot excursion spur (frames with NO revisit) — and
renders each frame as the world points within sensor range, expressed in
the sensor frame with noise and dropout.

The output is written as a reference-convention Ford-layout dataset tree
(`downsampled_xyzi/01/%06d.npy` + `sequences/01/poses.txt`, LiDAR-frame
12-float rows), so the ENTIRE existing CLI chain runs on it unmodified:

  python experiments/generate_pairs.py --dataset_root OUT --family ford \
      --seq 1 --tasks overlap,tuples
  python experiments/train_loop_detection.py --dataset_root OUT \
      --family ford --seq 1 --tuple_file OUT/training_tuples_seq01.npz ...
  python experiments/test_loop_detection.py --dataset_root OUT --family ford \
      --seq 1 --gt_file OUT/loop_gt_seq01_0.3overlap.npz ...

This is the sequence-scale retrieval rehearsal: F1max/AUC/R@1 from MODEL
descriptors at O(10^2-10^3) frames through the same eval path the reference
uses (`eval_loop_detection_overlap_dataset.py:66-259`).
"""

import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

DEMO_DIR = "/root/reference/demo/data_demo"
DEMO_FRAMES = [26, 560, 958, 3528, 3854, 4481]


def build_world(rng):
    """Six real scans placed on a ring, over location-distinctive terrain.

    Terrain = undulating ground + randomly placed vertical posts: every
    trajectory position (including the between-site chords and the spur)
    sees geometry, and the random post constellation gives each location a
    signature a descriptor can latch onto — the world is never locally
    self-similar."""
    from lcrnet_tpu.data.kitti import load_scan_npy

    sites = []
    pts = []
    n_sites = len(DEMO_FRAMES)
    ring_r = 140.0
    for k, f in enumerate(DEMO_FRAMES):
        scan = load_scan_npy(osp.join(DEMO_DIR, f"{f:06d}.npy"))
        # trim to a 60 m disc so sites stay distinct
        keep = np.linalg.norm(scan[:, :2], axis=1) < 60.0
        scan = scan[keep]
        ang = 2 * np.pi * k / n_sites
        center = np.array([ring_r * np.cos(ang), ring_r * np.sin(ang), 0.0], np.float32)
        # fixed per-site yaw so different sites are not trivially aligned
        yaw = rng.uniform(0, 2 * np.pi)
        c, s = np.cos(yaw), np.sin(yaw)
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        pts.append(scan @ rot.T + center)
        sites.append(center)

    world_r = ring_r * 1.9
    # undulating ground (~4k pts / frame disc at 55 m range)
    n_ground = 90_000
    g = rng.uniform(-world_r, world_r, (n_ground * 2, 2)).astype(np.float32)
    g = g[np.linalg.norm(g, axis=1) < world_r][:n_ground]
    gz = (1.5 * np.sin(0.035 * g[:, 0]) * np.cos(0.028 * g[:, 1])
          + rng.normal(scale=0.05, size=len(g))).astype(np.float32)
    pts.append(np.column_stack([g, gz]))
    # vertical posts: ~1500 constellation points of 12 each
    n_posts = 1500
    px = rng.uniform(-world_r, world_r, (n_posts * 2, 2)).astype(np.float32)
    px = px[np.linalg.norm(px, axis=1) < world_r][:n_posts]
    heights = rng.uniform(2.0, 8.0, n_posts).astype(np.float32)
    levels = np.linspace(0.0, 1.0, 12, dtype=np.float32)
    post_pts = np.repeat(px, 12, axis=0)
    post_z = (heights[:, None] * levels[None, :]).reshape(-1)
    pts.append(np.column_stack([post_pts, post_z]))
    return np.concatenate(pts).astype(np.float32), np.stack(sites)


def lap_waypoints(sites, lateral_offset, reverse):
    way = list(sites)
    if reverse:
        way = way[::-1]
    way = np.asarray(way, np.float32).copy()
    way[:, 0] += lateral_offset
    return way


def densify(waypoints, spacing):
    """Piecewise-linear path resampled at `spacing` metres."""
    closed = np.vstack([waypoints, waypoints[:1]])
    out = []
    for a, b in zip(closed[:-1], closed[1:]):
        seg = np.linalg.norm(b - a)
        n = max(int(seg // spacing), 1)
        for t in np.arange(n) / n:
            out.append(a * (1 - t) + b * t)
    return np.asarray(out, np.float32)


def poses_from_path(path_pts):
    """Yaw-following LiDAR poses (T_world_sensor) along the path."""
    fwd = np.diff(np.vstack([path_pts, path_pts[-1:] * 2 - path_pts[-2:-1]]), axis=0)
    poses = np.tile(np.eye(4, dtype=np.float32), (len(path_pts), 1, 1))
    for i, (p, f) in enumerate(zip(path_pts, fwd)):
        yaw = np.arctan2(f[1], f[0])
        c, s = np.cos(yaw), np.sin(yaw)
        poses[i, :3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        poses[i, :3, 3] = p
    return poses


def render_frame(world, pose, rng, sensor_range, noise, keep_ratio, max_points):
    d = np.linalg.norm(world[:, :2] - pose[:2, 3], axis=1)
    local = world[d < sensor_range]
    inv = np.linalg.inv(pose)
    local = local @ inv[:3, :3].T + inv[:3, 3]
    keep = rng.random(len(local)) < keep_ratio
    local = local[keep]
    local = local + rng.normal(scale=noise, size=local.shape).astype(np.float32)
    if len(local) > max_points:
        local = local[rng.choice(len(local), max_points, replace=False)]
    return local.astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seq", type=int, default=1)
    ap.add_argument("--spacing", type=float, default=4.0, help="frame spacing (m)")
    ap.add_argument("--lateral_offset", type=float, default=2.5,
                    help="lap-2 path offset (m) — revisits are near, not exact")
    ap.add_argument("--reverse_lap2", action="store_true", default=True)
    ap.add_argument("--laps", type=int, default=2,
                    help="total ring laps; laps beyond 2 alternate direction "
                         "and fan out in lateral offset (scales the frame "
                         "count toward KITTI-00's 4541 without changing the "
                         "world)")
    ap.add_argument("--sensor_range", type=float, default=55.0)
    ap.add_argument("--noise", type=float, default=0.02)
    ap.add_argument("--keep_ratio", type=float, default=0.85)
    ap.add_argument("--max_points", type=int, default=18000)
    ap.add_argument("--seed", type=int, default=7351)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    world, sites = build_world(rng)
    print(f"world: {len(world)} points over {len(sites)} sites")

    lap1 = densify(lap_waypoints(sites, 0.0, reverse=False), args.spacing)
    laps = [lap1]
    for k in range(2, max(args.laps, 2) + 1):
        # fan out: 2.5, -2.5, 5.0, -5.0, ... m lateral; alternate direction
        off = args.lateral_offset * ((k // 2) * (1 if k % 2 == 0 else -1))
        rev = args.reverse_lap2 if k == 2 else (k % 2 == 1)
        laps.append(densify(lap_waypoints(sites, off, reverse=rev), args.spacing))
    # excursion spur: out to 1.6x ring radius and back, visited once —
    # these frames have no revisit and anchor the negative side of the GT
    spur_way = np.asarray(
        [sites[0], sites[0] * 1.6, sites[0] * 1.6 + [0, 50, 0], sites[0]], np.float32
    )
    spur = densify(spur_way, args.spacing)
    path = np.vstack([laps[0], spur] + laps[1:])
    poses = poses_from_path(path)
    print(f"trajectory: {len(poses)} frames "
          f"(laps {[len(l) for l in laps]}, spur {len(spur)})")

    seq_tag = f"{args.seq:02d}"
    scan_dir = osp.join(args.out, "downsampled_xyzi", seq_tag)
    pose_dir = osp.join(args.out, "sequences", seq_tag)
    os.makedirs(scan_dir, exist_ok=True)
    os.makedirs(pose_dir, exist_ok=True)

    counts = []
    for i, pose in enumerate(poses):
        frame = render_frame(world, pose, rng, args.sensor_range, args.noise,
                             args.keep_ratio, args.max_points)
        counts.append(len(frame))
        xyzi = np.concatenate([frame, np.zeros((len(frame), 1), np.float32)], axis=1)
        np.save(osp.join(scan_dir, f"{i:06d}.npy"), xyzi)
    with open(osp.join(pose_dir, "poses.txt"), "w") as f:
        for p in poses:
            f.write(" ".join(f"{v:.9f}" for v in p[:3, :4].ravel()) + "\n")
    print(f"frames: {len(poses)} (points/frame min {min(counts)} "
          f"median {int(np.median(counts))} max {max(counts)})")
    print(f"dataset tree written under {args.out} (family=ford, seq={args.seq})")


if __name__ == "__main__":
    main()

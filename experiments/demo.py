#!/usr/bin/env python
"""Demo: single-pair inference — global descriptor distance + 6-DoF pose.

Parity target: `demo/demo.py:16-117` in the reference (KITTI-00 frame pairs
from `demo/data_demo/*.npy`), minus the open3d visualization (headless
environment).  The whole reference stack (collate workers, CPU radius
searches, CPU SVD) is one jitted TPU call here.

Usage:
  python experiments/demo.py [--data_dir DIR] [--anc 958] [--pos 3854]
                             [--snapshot DIR]
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/root/reference/demo/data_demo")
    ap.add_argument("--anc", type=int, default=958)
    ap.add_argument("--pos", type=int, default=3854)
    ap.add_argument("--snapshot", default=None, help="orbax snapshot dir")
    ap.add_argument("--dump_scene", default=None,
                    help="write the correspondence scene as a PLY (the headless"
                         " stand-in for the reference demo's --vis)")
    args = ap.parse_args()

    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.kitti import load_scan_npy, pad_points
    from lcrnet_tpu.engine.checkpoint import load_snapshot
    from lcrnet_tpu.pipeline import init_params, make_pair_forward
    import jax

    cfg = make_cfg()
    params = init_params(cfg)
    if args.snapshot:
        params = load_snapshot(args.snapshot, template={"params": params})["params"]

    ref = load_scan_npy(osp.join(args.data_dir, f"{args.pos:06d}.npy"))
    src = load_scan_npy(osp.join(args.data_dir, f"{args.anc:06d}.npy"))
    rp, rm = pad_points(ref, cfg.shapes.points[0])
    sp, sm = pad_points(src, cfg.shapes.points[0])

    fwd = jax.jit(make_pair_forward(cfg))
    out = fwd(params, jnp.asarray(rp), jnp.asarray(rm), jnp.asarray(sp), jnp.asarray(sm))

    dist = float(np.linalg.norm(np.asarray(out["ref_feature_global"]) - np.asarray(out["src_feature_global"])))
    print(f"pair: anc {args.anc} / pos {args.pos}")
    print(f"descriptor L2 distance: {dist:.6f}")
    print("estimated transform (src -> ref):")
    print(np.array2string(np.asarray(out["estimated_transform"]), precision=6, suppress_small=False))

    if args.dump_scene:
        from lcrnet_tpu.utils.visualization import (
            correspondence_scene,
            find_true_false,
            write_ply,
        )

        mr = np.asarray(out["masks_f"][0])
        ms = np.asarray(out["masks_f"][1])
        cv = np.asarray(out["corr_valid"])
        ref_corr = np.asarray(out["ref_corr_points"])[cv]
        src_corr = np.asarray(out["src_corr_points"])[cv]
        # no GT in the demo: classify against the estimated pose (the
        # reference's visualization() colors by residual the same way)
        correct = find_true_false(
            src_corr, ref_corr, np.asarray(out["estimated_transform"])
        )
        pts, cols, edges, ecols = correspondence_scene(
            np.asarray(out["points_f"][0])[mr],
            np.asarray(out["points_f"][1])[ms],
            ref_corr,
            src_corr,
            correct,
        )
        write_ply(args.dump_scene, pts, cols, edges, ecols)
        print(f"scene written to {args.dump_scene} "
              f"({int(correct.sum())}/{len(correct)} inlier edges)")


if __name__ == "__main__":
    main()

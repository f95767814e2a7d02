#!/usr/bin/env python
"""Offline registration evaluation from npz dumps.

Parity target: `experiments/registration/eval.py:25-314`: coarse PIR, fine
IR/FMR, pose errors (RRE/RTE + per-axis RPY), RR = (RRE < 5 deg, RTE < 2 m).
Pose methods: `lgr` (stored estimate), `svd` (weighted Procrustes refit on
the dumped correspondences), `ransac` (native batched correspondence
RANSAC, `lcrnet_tpu/ops/ransac.py` — same defaults as the reference's
open3d path, `config_reg.py:69-73`), or `gnc` (native GNC-TLS,
`lcrnet_tpu/ops/gnc.py` — the reference's optional teaserpp method,
`eval.py:197-218`, same noise_bound/gnc_factor/iteration defaults).
"""

import argparse
import glob
import os.path as osp
import sys
import zlib

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--feature_dir", required=True)
    ap.add_argument("--method", choices=["lgr", "svd", "ransac", "gnc"], default="lgr")
    ap.add_argument("--ir_radius", type=float, default=0.6)
    ap.add_argument("--ir_threshold", type=float, default=0.05)
    ap.add_argument("--ransac_threshold", type=float, default=0.3)
    ap.add_argument("--ransac_n", type=int, default=4)
    ap.add_argument("--ransac_iterations", type=int, default=50000)
    ap.add_argument("--gnc_noise_bound", type=float, default=0.3)
    ap.add_argument("--gnc_factor", type=float, default=1.4)
    ap.add_argument("--gnc_iterations", type=int, default=100)
    args = ap.parse_args()

    from lcrnet_tpu.engine.meters import SummaryBoard
    from lcrnet_tpu.utils.metrics import (
        compute_inlier_ratio,
        compute_registration_error,
        registration_recall,
    )

    files = sorted(glob.glob(osp.join(args.feature_dir, "*.npz")))
    if not files:
        raise SystemExit(f"no npz dumps in {args.feature_dir}")

    board = SummaryBoard()
    pose_results = []
    fail_cases = []
    for f in files:
        d = np.load(f)
        gt = d["transform"]
        corr_valid = d["corr_valid"].astype(bool)
        ref_corr = d["ref_corr_points"][corr_valid]
        src_corr = d["src_corr_points"][corr_valid]

        # coarse PIR from the dumped GT node correspondence list
        gt_valid = d["gt_node_corr_valid"].astype(bool)
        gt_set = set(
            zip(d["gt_node_corr_ref"][gt_valid].tolist(), d["gt_node_corr_src"][gt_valid].tolist())
        )
        nv = d["node_corr_valid"].astype(bool)
        pred = list(zip(d["ref_node_corr_indices"][nv].tolist(), d["src_node_corr_indices"][nv].tolist()))
        pir = float(np.mean([p in gt_set for p in pred])) if pred else 0.0

        ir = compute_inlier_ratio(ref_corr, src_corr, gt, radius=args.ir_radius)

        if args.method == "lgr":
            est = d["estimated_transform"]
        elif args.method == "ransac":
            import jax
            import jax.numpy as jnp

            from lcrnet_tpu.ops.ransac import correspondence_ransac

            # fixed-capacity call so every pair reuses one compiled program
            ref_all = d["ref_corr_points"]
            src_all = d["src_corr_points"]
            est = np.asarray(
                correspondence_ransac(
                    jnp.asarray(src_all),
                    jnp.asarray(ref_all),
                    jnp.asarray(d["corr_valid"].astype(bool)),
                    jax.random.PRNGKey(zlib.crc32(osp.basename(f).encode())),
                    distance_threshold=args.ransac_threshold,
                    num_samples=args.ransac_n,
                    num_iterations=args.ransac_iterations,
                )
            )
        elif args.method == "gnc":
            import jax.numpy as jnp

            from lcrnet_tpu.ops.gnc import gnc_tls_registration

            # fixed-capacity call so every pair reuses one compiled program
            est = np.asarray(
                gnc_tls_registration(
                    jnp.asarray(d["src_corr_points"]),
                    jnp.asarray(d["ref_corr_points"]),
                    jnp.asarray(d["corr_valid"].astype(bool)),
                    noise_bound=args.gnc_noise_bound,
                    gnc_factor=args.gnc_factor,
                    max_iterations=args.gnc_iterations,
                )
            )
        else:
            import jax.numpy as jnp

            from lcrnet_tpu.ops.procrustes import weighted_procrustes

            est = np.asarray(
                weighted_procrustes(
                    jnp.asarray(src_corr), jnp.asarray(ref_corr), jnp.asarray(d["corr_scores"][corr_valid])
                )
            )

        err = compute_registration_error(gt, est)
        pose_results.append(err)
        board.update("PIR", pir)
        board.update("IR", ir)
        board.update("FMR", float(ir > args.ir_threshold))
        if not (err["RRE"] < 5.0 and err["RTE"] < 2.0):
            fail_cases.append(osp.basename(f))

    agg = registration_recall(pose_results)
    print(f"pairs: {len(files)}  method: {args.method}")
    print(f"PIR: {board.meters['PIR'].mean():.4f}")
    print(f"IR: {board.meters['IR'].mean():.4f}  FMR: {board.meters['FMR'].mean():.4f}")
    print(
        f"RR: {agg['RR']:.2f}  RRE: {agg['RRE']:.3f} deg  RTE: {agg['RTE'] * 100:.1f} cm  "
        f"RYE: {agg['RYE']:.3f} deg"
    )
    if fail_cases:
        print(f"failed pairs ({len(fail_cases)}): {fail_cases[:20]}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Re-evaluation spread for the accuracy protocol: mean ± spread, not a draw.

ACCURACY_r03 found the held-out demo pair's RRE swings 0.2-2.7 deg across
training snapshots and float reduction orders; a single number is a draw
from that band.  This script evaluates the 3 GT demo pairs over a grid of

  snapshots (the last N eval_every checkpoints of an accuracy_benchmark run)
  x Kabsch backends (closed-form Jacobi vs LAPACK-style SVD — a pure
    reduction-order/algorithm perturbation, LCRNET_KABSCH env)

and reports per-pair mean/min/max/std RRE/RTE plus RR over all cells.  The
headline accuracy claim should be the mean and spread printed here.

Usage:
  python experiments/eval_spread.py --run_dir output/accuracy_r04 \
      [--num_snapshots 3] [--out ACCURACY_SPREAD.json]
"""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def list_step_dirs(snap_root):
    steps = []
    for name in os.listdir(snap_root):
        if name.isdigit():
            steps.append(int(name))
    return [osp.join(snap_root, str(s)) for s in sorted(steps)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run_dir", required=True,
                    help="accuracy_benchmark --output dir (contains snapshots/)")
    ap.add_argument("--num_snapshots", type=int, default=3,
                    help="evaluate the last N step snapshots")
    ap.add_argument("--kabsch", default="jacobi,svd")
    ap.add_argument("--out", default=None, help="JSON report path "
                    "(default <run_dir>/accuracy_spread.json)")
    args = ap.parse_args()

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.engine.checkpoint import load_snapshot
    from lcrnet_tpu.pipeline import init_params

    from accuracy_benchmark import (  # noqa: E402 (sibling script import)
        HELD_OUT_PAIR,
        load_demo_scans,
        load_gt_pairs,
        run_registration_eval,
    )

    cfg = make_cfg()
    scans = load_demo_scans()
    gt_pairs = load_gt_pairs()
    template = {"params": init_params(cfg)}

    snap_root = osp.join(args.run_dir, "snapshots")
    step_dirs = list_step_dirs(snap_root)[-args.num_snapshots:]
    assert step_dirs, f"no step snapshots under {snap_root}"
    kabsch_variants = args.kabsch.split(",")

    cells = []  # one dict per (snapshot, kabsch) cell per pair
    for sd in step_dirs:
        params = load_snapshot(osp.dirname(sd), template=template,
                               step=int(osp.basename(sd)))["params"]
        for kb in kabsch_variants:
            os.environ["LCRNET_KABSCH"] = kb
            evals = run_registration_eval(
                cfg, params, scans, gt_pairs, osp.join(args.run_dir, "features_spread")
            )
            for e in evals:
                e["snapshot"] = int(osp.basename(sd))
                e["kabsch"] = kb
                cells.append(e)
            print(f"[{osp.basename(sd)} kabsch={kb}] " + "  ".join(
                f"({e['anc_idx']},{e['pos_idx']}) RRE={e['RRE']:.3f} "
                f"RTE={e['RTE'] * 100:.1f}cm" for e in evals), flush=True)

    report = {"snapshots": [int(osp.basename(s)) for s in step_dirs],
              "kabsch": kabsch_variants, "pairs": {}}
    print("\n== spread over snapshots x kabsch ==")
    for pair in sorted({(c["anc_idx"], c["pos_idx"]) for c in cells}):
        rows = [c for c in cells if (c["anc_idx"], c["pos_idx"]) == pair]
        rre = np.array([c["RRE"] for c in rows])
        rte = np.array([c["RTE"] for c in rows])
        rr = np.array([c["RR"] for c in rows])
        held = pair == HELD_OUT_PAIR
        stats = {
            "held_out_scans": held,
            "n_cells": len(rows),
            "RRE_mean": round(float(rre.mean()), 4),
            "RRE_std": round(float(rre.std()), 4),
            "RRE_min": round(float(rre.min()), 4),
            "RRE_max": round(float(rre.max()), 4),
            "RTE_cm_mean": round(float(rte.mean() * 100), 2),
            "RTE_cm_max": round(float(rte.max() * 100), 2),
            "RR": round(float(rr.mean()), 4),
        }
        report["pairs"][f"{pair[0]}-{pair[1]}"] = stats
        tag = " [held-out scans]" if held else ""
        print(f"  ({pair[0]},{pair[1]}){tag}: RRE {stats['RRE_mean']:.3f}"
              f" ± {stats['RRE_std']:.3f} deg (max {stats['RRE_max']:.3f}), "
              f"RTE {stats['RTE_cm_mean']:.1f} cm (max {stats['RTE_cm_max']:.1f}), "
              f"RR {stats['RR'] * 100:.0f}%")

    out = args.out or osp.join(args.run_dir, "accuracy_spread.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report written to {out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Loop detection testing: extract per-scan descriptors, run retrieval eval.

Parity target: `experiments/loop_detection/test_loop_detection.py:17-92`
(dump per-scan 256-d descriptors) +
`eval_loop_detection_overlap_dataset.py:148-261` (incremental retrieval,
P/R sweep, F1max, AUC, Recall@1, Recall@1%).  The per-frame faiss index
rebuild becomes one causal masked top-k scan on device.
"""

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def load_overlap_gt(path: str, n: int):
    """Per-anchor positive lists from the reference-format overlap npz
    (`loop_gt_seq00_0.3overlap_inactive.npz`: one object array, entry i =
    positive frame indices of anchor i), an {anc_idx, pos_idx} npz, or a
    simple 2-column pair file; returns list of lists."""
    gt = [[] for _ in range(n)]
    if path.endswith(".npz"):
        d = np.load(path, allow_pickle=True)
        # reference format: single object array of per-anchor positive lists
        if len(d.files) >= 1 and d[d.files[0]].dtype == object:
            arr = d[d.files[0]]
            for a in range(min(len(arr), n)):
                gt[a] = list(np.atleast_1d(arr[a]).astype(int)) if len(np.atleast_1d(arr[a])) else []
            return gt
        # accept either {anc_idx, pos_idx-lists} or row-per-loop arrays
        if "anc_idx" in d and "pos_idx" in d:
            for a, p in zip(d["anc_idx"], d["pos_idx"]):
                a = int(a)
                if a < n:
                    gt[a] = list(np.atleast_1d(p).astype(int))
        else:
            arr = d[d.files[0]]
            for row in arr.reshape(-1, 2):
                if int(row[0]) < n:
                    gt[int(row[0])].append(int(row[1]))
    else:
        arr = np.loadtxt(path)
        for row in np.atleast_2d(arr)[:, :2]:
            if int(row[0]) < n:
                gt[int(row[0])].append(int(row[1]))
    return gt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--family", default="kitti",
                    choices=["kitti", "kitti360", "ford", "apollo", "mulran"],
                    help="dataset family (reference evaluates KITTI + Ford)")
    ap.add_argument("--seq", default="0", help="sequence id (int or session name)")
    ap.add_argument("--num_frames", type=int, default=None)
    ap.add_argument("--snapshot", default=None)
    ap.add_argument("--gt_file", default=None, help="overlap GT npz/text")
    ap.add_argument("--descriptor_dir", default="output/features/loop_detection")
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--mesh_dp", type=int, default=0,
                    help="shard the retrieval database scan over this many "
                         "devices (0 = single-device scan)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.datasets import count_frames, make_sequence
    from lcrnet_tpu.data.kitti import pad_points
    from lcrnet_tpu.engine.checkpoint import load_snapshot
    from lcrnet_tpu.pipeline import init_params, make_describe
    from lcrnet_tpu.utils.retrieval import evaluate_loop_detection

    cfg = make_cfg()
    # Build the retrieval mesh up front so an insufficient --mesh_dp fails
    # fast, before the descriptor-extraction pass does its work.
    mesh = None
    if args.mesh_dp:
        from lcrnet_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(dp=args.mesh_dp)
    params = init_params(cfg)
    if args.snapshot:
        params = load_snapshot(args.snapshot, template={"params": params})["params"]

    seq = int(args.seq) if str(args.seq).isdigit() else args.seq
    seq_tag = f"{seq:02d}" if isinstance(seq, int) else str(seq)
    source = make_sequence(
        args.family, args.dataset_root, seq, cfg.backbone.init_voxel_size)
    total = count_frames(source)
    n = total if args.num_frames is None else min(args.num_frames, total)
    if n == 0:
        raise SystemExit("no scans found")

    describe = jax.jit(make_describe(cfg))
    os.makedirs(args.descriptor_dir, exist_ok=True)

    descs = np.zeros((n, cfg.backbone.output_dim), np.float32)
    t0 = time.time()
    cap = cfg.shapes.points[0]
    for start in range(0, n, args.batch):
        idxs = range(start, min(start + args.batch, n))
        pts, msks = [], []
        for i in idxs:
            p, m = pad_points(source(i), cap)
            pts.append(p)
            msks.append(m)
        while len(pts) < args.batch:  # static batch shape
            pts.append(pts[-1])
            msks.append(msks[-1])
        out = describe(params, jnp.asarray(np.stack(pts)), jnp.asarray(np.stack(msks)))
        out = np.asarray(out)
        for j, i in enumerate(idxs):
            descs[i] = out[j]
        if (start // args.batch) % 50 == 0:
            rate = (start + args.batch) / (time.time() - t0)
            print(f"[{start + len(list(idxs))}/{n}] {rate:.1f} scans/s")

    np.savez(osp.join(args.descriptor_dir, f"seq{seq_tag}_descriptors.npz"), descriptors=descs)

    if args.gt_file:
        from lcrnet_tpu.utils.retrieval import (
            save_pr_curve_png,
            save_predicted_distances,
            save_retrieval_artifacts,
        )

        gt = load_overlap_gt(args.gt_file, n)
        res = evaluate_loop_detection(descs, gt, mesh=mesh)
        save_retrieval_artifacts(
            osp.join(args.descriptor_dir, f"seq{seq_tag}_pr_curve.npz"), res
        )
        save_pr_curve_png(osp.join(args.descriptor_dir, "PRC.png"), res)
        save_predicted_distances(
            osp.join(args.descriptor_dir, "predicted_des_L2_dis.npz"), res
        )
        print(
            f"AUC: {res['AUC']:.3f}  F1max: {res['F1max']:.3f}  "
            f"Recall@1: {res['Recall@1']:.3f}  Recall@1%: {res['Recall@1pct']:.3f}"
            f"  Recall@1%honest(k={res['honest_k']}): "
            f"{res['Recall@1pct_honest']:.3f}"
            f"  db_scan: {res['db_scan_seconds']:.2f}s/{n}f"
        )


if __name__ == "__main__":
    main()

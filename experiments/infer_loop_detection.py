#!/usr/bin/env python
"""Online loop-candidate inference: stream descriptors, emit top-1 loops
under an L2 threshold.

Parity target: `experiments/inference/infer_loop_detection_descriptor_generation.py`
+ `infer_loop_detection_find_top1.py:14-136` (faiss top-1 under threshold
0.11/0.22 -> candidate text files).  The database scan is the on-device
causal top-k.
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
    ap.add_argument("--seq", default="8", help="sequence id (int or session name)")
    ap.add_argument("--num_frames", type=int, default=None)
    ap.add_argument("--snapshot", default=None)
    ap.add_argument("--threshold", type=float, default=0.11)
    ap.add_argument("--exclusion", type=int, default=100)
    ap.add_argument("--output", default="output/inference/loop_candidates.txt")
    ap.add_argument("--batch", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.datasets import count_frames, make_sequence
    from lcrnet_tpu.data.kitti import pad_points
    from lcrnet_tpu.engine.checkpoint import load_snapshot
    from lcrnet_tpu.pipeline import init_params, make_describe
    from lcrnet_tpu.utils.retrieval import causal_topk_search

    cfg = make_cfg()
    params = init_params(cfg)
    if args.snapshot:
        params = load_snapshot(args.snapshot, template={"params": params})["params"]

    seq = int(args.seq) if str(args.seq).isdigit() else args.seq
    source = make_sequence(
        args.family, args.dataset_root, seq, cfg.backbone.init_voxel_size)
    total = count_frames(source)
    n = total if args.num_frames is None else min(args.num_frames, total)

    describe = jax.jit(make_describe(cfg))
    cap = cfg.shapes.points[0]
    descs = np.zeros((n, cfg.backbone.output_dim), np.float32)
    for start in range(0, n, args.batch):
        idxs = list(range(start, min(start + args.batch, n)))
        pts, msks = [], []
        for i in idxs:
            p, m = pad_points(source(i), cap)
            pts.append(p)
            msks.append(m)
        while len(pts) < args.batch:
            pts.append(pts[-1])
            msks.append(msks[-1])
        out = np.asarray(describe(params, jnp.asarray(np.stack(pts)), jnp.asarray(np.stack(msks))))
        for j, i in enumerate(idxs):
            descs[i] = out[j]

    dists, idx = causal_topk_search(jnp.asarray(descs), k=1, exclusion=args.exclusion)
    dists = np.asarray(dists)[:, 0]
    idx = np.asarray(idx)[:, 0]

    os.makedirs(osp.dirname(osp.abspath(args.output)), exist_ok=True)
    count = 0
    with open(args.output, "w") as f:
        for i in range(n):
            if dists[i] < args.threshold:
                f.write(f"{i} {idx[i]} {dists[i]:.6f}\n")
                count += 1
    print(f"found {count} loop candidates (threshold {args.threshold}) -> {args.output}")


if __name__ == "__main__":
    main()

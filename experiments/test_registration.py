#!/usr/bin/env python
"""Registration testing: run pairs, dump per-pair npz artifacts.

Parity target: `experiments/registration/test_registration.py:16-104` (and
`test_loop_closure.py` — same dump over loop pairs): per pair, save points,
correspondences, scores, estimated + GT transforms into `feature_dir` npz
files consumed by the offline eval (`eval_registration.py`).
"""

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--family", default="kitti",
                    choices=["kitti", "kitti360", "ford", "apollo", "mulran"])
    ap.add_argument("--seq", default="8", help="sequence id (int or session name)")
    ap.add_argument("--pair_file", required=True)
    ap.add_argument("--snapshot", default=None)
    ap.add_argument("--feature_dir", default="output/features/registration")
    ap.add_argument("--limit", type=int, default=None, help="max pairs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.loader import make_registration_dataset
    from lcrnet_tpu.engine.checkpoint import load_snapshot
    from lcrnet_tpu.engine.meters import SummaryBoard, Timer
    from lcrnet_tpu.models.losses import evaluate_pair
    from lcrnet_tpu.pipeline import build_batch_pyramid, init_params
    from lcrnet_tpu.models.lcrnet import LCRNet

    cfg = make_cfg()
    params = init_params(cfg)
    if args.snapshot:
        params = load_snapshot(args.snapshot, template={"params": params})["params"]

    seq = int(args.seq) if str(args.seq).isdigit() else args.seq
    dataset = make_registration_dataset(
        cfg, args.family, args.dataset_root, seq, args.pair_file)
    os.makedirs(args.feature_dir, exist_ok=True)

    model = LCRNet(cfg)

    @jax.jit
    def run_pair(params, points, masks, transform):
        pyramid = build_batch_pyramid(points, masks, cfg)
        out = model.apply(params, pyramid, transform, training=False)
        metrics = evaluate_pair(out, transform, cfg)
        keep = {
            "ref_points_f": out["points_f"][0],
            "src_points_f": out["points_f"][1],
            "ref_masks_f": out["masks_f"][0],
            "src_masks_f": out["masks_f"][1],
            "ref_nodes": out["nodes"][0],
            "src_nodes": out["nodes"][1],
            "node_masks": out["node_masks"],
            "ref_node_corr_indices": out["ref_node_corr_indices"],
            "src_node_corr_indices": out["src_node_corr_indices"],
            "node_corr_valid": out["node_corr_valid"],
            "ref_corr_points": out["ref_corr_points"],
            "src_corr_points": out["src_corr_points"],
            "corr_scores": out["corr_scores"],
            "corr_valid": out["corr_valid"],
            "estimated_transform": out["estimated_transform"],
            "gt_node_corr_ref": out["gt_node_corr"].ref_indices,
            "gt_node_corr_src": out["gt_node_corr"].src_indices,
            "gt_node_corr_overlaps": out["gt_node_corr"].overlaps,
            "gt_node_corr_valid": out["gt_node_corr"].valid,
        }
        return keep, metrics

    board = SummaryBoard()
    n = len(dataset) if args.limit is None else min(args.limit, len(dataset))

    # overlap host work with the device: sample loading runs one step ahead
    # (prefetch thread) and the compressed npz writes run behind (writer
    # thread) — the main loop only dispatches and converts
    from queue import Queue
    from threading import Thread

    from lcrnet_tpu.data.loader import prefetch

    write_q: "Queue" = Queue(maxsize=4)

    def writer():
        while True:
            item = write_q.get()
            if item is None:
                return
            path, payload = item
            np.savez_compressed(path, **payload)

    wt = Thread(target=writer, daemon=True)
    wt.start()

    t_start = time.time()
    samples = prefetch((dataset[i] for i in range(n)), depth=2)
    for i, sample in enumerate(samples):
        keep, metrics = run_pair(
            params,
            jnp.asarray(sample["points"]),
            jnp.asarray(sample["masks"]),
            jnp.asarray(sample["transform"]),
        )
        keep = {k: np.asarray(v) for k, v in keep.items()}
        keep["transform"] = sample["transform"]
        name = (f'{int(seq):02d}_{sample["anc_idx"]}_{sample["pos_idx"]}.npz'
                if str(seq).isdigit() or isinstance(seq, int)
                else f'{seq}_{sample["anc_idx"]}_{sample["pos_idx"]}.npz')
        write_q.put((osp.join(args.feature_dir, name), keep))
        board.update_from_dict({k: float(v) for k, v in metrics.items()})
        if (i + 1) % 20 == 0:
            rate = (i + 1) / (time.time() - t_start)
            print(f"[{i + 1}/{n}] {board.format()} ({rate:.2f} pairs/s)")
    write_q.put(None)
    wt.join()
    print(f"done: {board.format()}")


if __name__ == "__main__":
    main()

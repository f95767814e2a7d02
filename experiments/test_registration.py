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


def build_parser(feature_dir_default="output/features/registration",
                 description=__doc__):
    ap = argparse.ArgumentParser(description=description)
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--family", default="kitti",
                    choices=["kitti", "kitti360", "ford", "apollo", "mulran"])
    ap.add_argument("--seq", default="8", help="sequence id (int or session name)")
    ap.add_argument("--pair_file", required=True)
    ap.add_argument("--snapshot", default=None)
    ap.add_argument("--feature_dir", default=feature_dir_default)
    ap.add_argument("--limit", type=int, default=None, help="max pairs")
    ap.add_argument("--pairs_per_batch", type=int, default=1,
                    help="pairs per device program (amortizes dispatch "
                         "latency on the relay; per-pair results identical)")
    return ap


def main(argv=None, parser=None):
    args = (parser or build_parser()).parse_args(argv)
    run(args)


def run(args):

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

    from lcrnet_tpu.utils.dumps import registration_dump_arrays

    def keep_and_metrics(out, transform):
        metrics = evaluate_pair(out, transform, cfg)
        return registration_dump_arrays(out), metrics

    @jax.jit
    def run_pair(params, points, masks, transform):
        pyramid = build_batch_pyramid(points, masks, cfg)
        out = model.apply(params, pyramid, transform, training=False)
        return keep_and_metrics(out, transform)

    ppb = max(1, args.pairs_per_batch)

    @jax.jit
    def run_pairs(params, points, masks, transforms):
        """P pairs per program: (P, 2, N, 3) in, per-pair keeps/metrics out
        (leading P axis).  Identical per-pair results to run_pair
        (tests/test_multipair.py)."""
        p, two, n0, _ = points.shape
        pyramid = build_batch_pyramid(points.reshape(p * two, n0, 3),
                                      masks.reshape(p * two, n0), cfg)
        out = model.apply(params, pyramid, transforms, training=False, num_pairs=ppb)
        keeps, mets = [], []
        for i in range(ppb):  # static unroll: slicing only, no recompute
            view = {
                "points_f": out["points_f"][2 * i:2 * i + 2],
                "masks_f": out["masks_f"][2 * i:2 * i + 2],
                "nodes": out["nodes"][2 * i:2 * i + 2],
                "node_masks": out["node_masks"][2 * i:2 * i + 2],
                "gt_node_corr": jax.tree.map(lambda x, i=i: x[i], out["gt_node_corr"]),
                "ref_node_corr_indices": out["ref_node_corr_indices"][i],
                "src_node_corr_indices": out["src_node_corr_indices"][i],
                "node_corr_valid": out["node_corr_valid"][i],
                "ref_corr_points": out["ref_corr_points"][i],
                "src_corr_points": out["src_corr_points"][i],
                "corr_scores": out["corr_scores"][i],
                "corr_valid": out["corr_valid"][i],
                "estimated_transform": out["estimated_transform"][i],
            }
            k, m = keep_and_metrics(view, transforms[i])
            keeps.append(k)
            mets.append(m)
        stack = lambda ds: {k: jnp.stack([d[k] for d in ds]) for k in ds[0]}
        return stack(keeps), stack(mets)

    board = SummaryBoard()
    n = len(dataset) if args.limit is None else min(args.limit, len(dataset))

    # overlap host work with the device: sample loading runs one step ahead
    # (prefetch thread) and the compressed npz writes run behind (writer
    # thread) — the main loop only dispatches and converts
    from queue import Queue
    from threading import Thread

    from lcrnet_tpu.data.loader import prefetch

    write_q: "Queue" = Queue(maxsize=4)
    write_err = []

    def writer():
        while True:
            item = write_q.get()
            try:
                if item is None:
                    return
                path, payload = item
                np.savez_compressed(path, **payload)
            except BaseException as e:  # noqa: BLE001 — surface in main loop
                write_err.append(e)
                return  # keep draining impossible; main loop raises below
            finally:
                write_q.task_done()

    wt = Thread(target=writer, daemon=True)
    wt.start()

    def _safe_put(item):
        # a dead writer would otherwise deadlock the bounded queue
        from queue import Full

        while True:
            if write_err:
                raise RuntimeError("npz writer thread failed") from write_err[0]
            try:
                write_q.put(item, timeout=5.0)
                return
            except Full:
                continue

    def dump_name(sample):
        return (f'{int(seq):02d}_{sample["anc_idx"]}_{sample["pos_idx"]}.npz'
                if str(seq).isdigit() or isinstance(seq, int)
                else f'{seq}_{sample["anc_idx"]}_{sample["pos_idx"]}.npz')

    t_start = time.time()
    done = 0

    def finish_one(sample, keep, metrics):
        nonlocal done
        keep = {k: np.asarray(v) for k, v in keep.items()}
        keep["transform"] = sample["transform"]
        _safe_put((osp.join(args.feature_dir, dump_name(sample)), keep))
        board.update_from_dict({k: float(v) for k, v in metrics.items()})
        done += 1
        if done % 20 == 0:
            rate = done / (time.time() - t_start)
            print(f"[{done}/{n}] {board.format()} ({rate:.2f} pairs/s)")

    if ppb == 1:
        samples = prefetch((dataset[i] for i in range(n)), depth=2)
        for sample in samples:
            keep, metrics = run_pair(
                params,
                jnp.asarray(sample["points"]),
                jnp.asarray(sample["masks"]),
                jnp.asarray(sample["transform"]),
            )
            finish_one(sample, keep, metrics)
    else:
        def batched():
            # final short batch is padded by repeating its last sample; the
            # padded lanes are dropped on output
            for start in range(0, n, ppb):
                group = [dataset[i] for i in range(start, min(start + ppb, n))]
                real = len(group)
                while len(group) < ppb:
                    group.append(group[-1])
                yield real, group, (
                    jnp.asarray(np.stack([s["points"] for s in group])),
                    jnp.asarray(np.stack([s["masks"] for s in group])),
                    jnp.asarray(np.stack([s["transform"] for s in group])),
                )

        for real, group, (pts, msks, tfs) in prefetch(batched(), depth=2):
            keeps, mets = run_pairs(params, pts, msks, tfs)
            for i in range(real):
                finish_one(
                    group[i],
                    {k: v[i] for k, v in keeps.items()},
                    {k: v[i] for k, v in mets.items()},
                )
    _safe_put(None)
    wt.join()
    if write_err:
        raise RuntimeError("npz writer thread failed") from write_err[0]
    print(f"done: {board.format()}")


if __name__ == "__main__":
    main()

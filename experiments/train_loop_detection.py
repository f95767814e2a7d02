#!/usr/bin/env python
"""Loop-detection (retrieval) training — stage 2.

Parity target: `experiments/loop_detection/trainval_loop_detection.py:13-64`:
Adan optimizer, triplet loss over anchor/positive/negative tuples.  The
reference's three modes (offline / half / online — frozen or cached encoder
features, `LCRNet_GlobalDescrition.py:25-110`) map onto --train_mode:
  online  — full encoder + NetVLAD backprop (the reference's `online`)
  frozen  — stop-gradient through the encoder, train NetVLAD only (the
            TPU equivalent of offline/half: with the encoder inside the same
            jitted step, caching features on disk buys nothing — a
            stop_gradient gives the identical optimization problem)

After training, graft the netvlad subtree into a registration snapshot with
`engine.checkpoint.merge_netvlad` (reference `merge_model.py:5-34`).
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset_root", required=True)
    ap.add_argument("--family", default="kitti",
                    choices=["kitti", "kitti360", "ford", "apollo", "mulran"])
    ap.add_argument("--tuple_file", required=True,
                    help="npz with anc_idx / pos_idx lists / neg_idx lists per row")
    ap.add_argument("--seq", default="0", help="sequence id (int or session name)")
    ap.add_argument("--output", default="output/loop_detection")
    ap.add_argument("--train_mode", choices=["online", "frozen"], default="online")
    ap.add_argument("--num_pos", type=int, default=1)
    ap.add_argument("--num_neg", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--max_epoch", type=int, default=130)
    ap.add_argument("--init_snapshot", default=None, help="stage-1 registration snapshot")
    ap.add_argument("--chunk", type=int, default=1,
                    help="train steps per device dispatch (lax.scan; "
                         "amortizes relay dispatch latency)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.datasets import count_frames, make_sequence
    from lcrnet_tpu.data.kitti import pad_points
    from lcrnet_tpu.engine.checkpoint import load_snapshot, save_snapshot
    from lcrnet_tpu.engine.logger import make_logger
    from lcrnet_tpu.engine.meters import SummaryBoard
    from lcrnet_tpu.engine.train import create_train_state, make_descriptor_train_step
    from lcrnet_tpu.pipeline import init_params

    cfg = make_cfg().replace()
    cfg = cfg.replace(optim=cfg.optim.__class__(optimizer="adan", max_epoch=args.max_epoch))
    logger = make_logger(osp.join(args.output, "logs", "train.log"))

    params = init_params(cfg)
    if args.init_snapshot:
        params = load_snapshot(args.init_snapshot, template={"params": params})["params"]

    d = np.load(args.tuple_file, allow_pickle=True)
    tuples = list(zip(d["anc_idx"], d["pos_idx"], d["neg_idx"]))
    seq = int(args.seq) if str(args.seq).isdigit() else args.seq
    source = make_sequence(
        args.family, args.dataset_root, seq, cfg.backbone.init_voxel_size)

    frozen = args.train_mode == "frozen"
    state = create_train_state(
        cfg, params, steps_per_epoch=len(tuples),
        trainable_subtrees=("netvlad",) if frozen else None,
    )
    step = make_descriptor_train_step(cfg, args.num_pos, args.num_neg, frozen=frozen)
    if args.chunk > 1:
        from lcrnet_tpu.engine.train import make_descriptor_train_multistep

        multistep = make_descriptor_train_multistep(
            cfg, args.num_pos, args.num_neg, frozen=frozen
        )
    cap = cfg.shapes.points[0]
    group = 1 + args.num_pos + args.num_neg

    def make_batch(order, start):
        pts = np.zeros((args.batch_size, group, cap, 3), np.float32)
        msk = np.zeros((args.batch_size, group, cap), bool)
        for b in range(args.batch_size):
            anc, poss, negs = tuples[order[start + b]]
            idxs = [int(anc)]
            idxs += list(np.atleast_1d(poss).astype(int)[: args.num_pos])
            idxs += list(np.atleast_1d(negs).astype(int)[: args.num_neg])
            while len(idxs) < group:  # pad-by-duplication, as the reference
                idxs.append(idxs[-1])
            for g, i in enumerate(idxs):
                p, m = pad_points(source(i), cap)
                pts[b, g], msk[b, g] = p, m
        return pts, msk

    rng = np.random.default_rng(cfg.seed)
    for epoch in range(args.max_epoch):
        board = SummaryBoard()
        order = rng.permutation(len(tuples))
        starts = list(range(0, len(order) - args.batch_size + 1, args.batch_size))
        i = 0
        while i < len(starts):
            if args.chunk > 1 and i + args.chunk <= len(starts):
                chunk = [make_batch(order, starts[i + k]) for k in range(args.chunk)]
                i += args.chunk
                pts = np.stack([c[0] for c in chunk])
                msk = np.stack([c[1] for c in chunk])
                state, metrics = multistep(state, jnp.asarray(pts), jnp.asarray(msk))
            else:
                pts, msk = make_batch(order, starts[i])
                i += 1
                state, metrics = step(state, jnp.asarray(pts), jnp.asarray(msk))
            board.update_from_dict({k: float(v) for k, v in metrics.items()})
        logger.info(f"epoch {epoch + 1}/{args.max_epoch}: {board.format()}")
        save_snapshot(osp.join(args.output, "snapshots"), epoch + 1, state.params, state.opt_state)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Loop-detection (retrieval) training — stage 2.

Parity target: `experiments/loop_detection/trainval_loop_detection.py:13-64`:
Adan optimizer, triplet loss over anchor/positive/negative tuples.  The
reference's three modes (offline / half / online — frozen or cached encoder
features, `LCRNet_GlobalDescrition.py:25-110`) map onto --train_mode:
  online  — full encoder + NetVLAD backprop (the reference's `online`)
  frozen  — stop-gradient through the encoder, train NetVLAD only (same
            optimization problem as the reference's offline/half, but the
            encoder is recomputed for every tuple member inside the step)
  half    — the reference's throughput mode exactly: encoder forward on the
            anchor only (no grad), positives/negatives consumed as
            pre-extracted stage-4 feature dumps (--feature_dir, produced by
            `experiments/preextract_features.py --snapshot <stage-1>`);
            NetVLAD-only updates at (1+P+N)x fewer encoder forwards

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
    ap.add_argument("--train_mode", choices=["online", "frozen", "half"], default="online")
    ap.add_argument("--feature_dir", default=None,
                    help="half mode: dir of per-scan stage-4 feature npz "
                         "dumps from preextract_features.py")
    ap.add_argument("--num_pos", type=int, default=1)
    ap.add_argument("--num_neg", type=int, default=3)
    ap.add_argument("--batch_size", type=int, default=1)
    ap.add_argument("--max_epoch", type=int, default=130)
    ap.add_argument("--lr", type=float, default=None,
                    help="override optimizer lr (e.g. 1e-3 for the "
                         "NetVLAD-only frozen/half modes)")
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
    optim_kwargs = dict(optimizer="adan", max_epoch=args.max_epoch)
    if args.lr is not None:
        optim_kwargs["lr"] = args.lr
    cfg = cfg.replace(optim=cfg.optim.__class__(**optim_kwargs))
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
    half = args.train_mode == "half"
    if half and not args.feature_dir:
        raise SystemExit("--train_mode half requires --feature_dir "
                         "(run experiments/preextract_features.py first)")
    state = create_train_state(
        cfg, params, steps_per_epoch=len(tuples),
        trainable_subtrees=("netvlad",) if (frozen or half) else None,
    )
    if half:
        from functools import lru_cache

        from lcrnet_tpu.engine.train import (
            make_descriptor_train_multistep_half, make_descriptor_train_step_half,
        )

        step = make_descriptor_train_step_half(cfg, args.num_pos, args.num_neg)
        if args.chunk > 1:
            multistep = make_descriptor_train_multistep_half(
                cfg, args.num_pos, args.num_neg)
        seq_tag = f"{seq:02d}" if isinstance(seq, int) else str(seq)

        @lru_cache(maxsize=1024)
        def cached_features(idx):
            d = np.load(osp.join(args.feature_dir, f"{seq_tag}_{idx:06d}.npz"))
            return d["feats"], d["mask"]
    else:
        step = make_descriptor_train_step(cfg, args.num_pos, args.num_neg, frozen=frozen)
        if args.chunk > 1:
            from lcrnet_tpu.engine.train import make_descriptor_train_multistep

            multistep = make_descriptor_train_multistep(
                cfg, args.num_pos, args.num_neg, frozen=frozen
            )
    cap = cfg.shapes.points[0]
    group = 1 + args.num_pos + args.num_neg

    def tuple_indices(order, start, b):
        anc, poss, negs = tuples[order[start + b]]
        idxs = [int(anc)]
        idxs += list(np.atleast_1d(poss).astype(int)[: args.num_pos])
        idxs += list(np.atleast_1d(negs).astype(int)[: args.num_neg])
        while len(idxs) < group:  # pad-by-duplication, as the reference
            idxs.append(idxs[-1])
        return idxs

    def make_batch(order, start):
        pts = np.zeros((args.batch_size, group, cap, 3), np.float32)
        msk = np.zeros((args.batch_size, group, cap), bool)
        for b in range(args.batch_size):
            for g, i in enumerate(tuple_indices(order, start, b)):
                p, m = pad_points(source(i), cap)
                pts[b, g], msk[b, g] = p, m
        return pts, msk

    def make_batch_half(order, start):
        cap4 = cfg.shapes.points[3]
        feat_dim = cfg.backbone.init_dim * 16
        pts = np.zeros((args.batch_size, cap, 3), np.float32)
        msk = np.zeros((args.batch_size, cap), bool)
        cf = np.zeros((args.batch_size, group - 1, cap4, feat_dim), np.float32)
        cm = np.zeros((args.batch_size, group - 1, cap4), bool)
        for b in range(args.batch_size):
            idxs = tuple_indices(order, start, b)
            p, m = pad_points(source(idxs[0]), cap)
            pts[b], msk[b] = p, m
            for g, i in enumerate(idxs[1:]):
                f, fm = cached_features(int(i))
                cf[b, g], cm[b, g] = f, fm
        return pts, msk, cf, cm

    build = make_batch_half if half else make_batch

    rng = np.random.default_rng(cfg.seed)
    for epoch in range(args.max_epoch):
        board = SummaryBoard()
        order = rng.permutation(len(tuples))
        starts = list(range(0, len(order) - args.batch_size + 1, args.batch_size))
        i = 0
        while i < len(starts):
            if args.chunk > 1 and i + args.chunk <= len(starts):
                chunk = [build(order, starts[i + k]) for k in range(args.chunk)]
                i += args.chunk
                arrays = [jnp.asarray(np.stack(part)) for part in zip(*chunk)]
                state, metrics = multistep(state, *arrays)
            else:
                arrays = [jnp.asarray(a) for a in build(order, starts[i])]
                i += 1
                state, metrics = step(state, *arrays)
            board.update_from_dict({k: float(v) for k, v in metrics.items()})
        logger.info(f"epoch {epoch + 1}/{args.max_epoch}: {board.format()}")
        save_snapshot(osp.join(args.output, "snapshots"), epoch + 1, state.params, state.opt_state)


if __name__ == "__main__":
    main()

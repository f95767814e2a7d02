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
    ap.add_argument("--save_every", type=int, default=1,
                    help="epochs between snapshots (the final epoch always "
                         "saves)")
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
        from lcrnet_tpu.engine.train import (
            make_descriptor_train_multistep_half, make_descriptor_train_step_half,
        )

        step = make_descriptor_train_step_half(cfg, args.num_pos, args.num_neg)
        if args.chunk > 1:
            multistep = make_descriptor_train_multistep_half(
                cfg, args.num_pos, args.num_neg)
        seq_tag = f"{seq:02d}" if isinstance(seq, int) else str(seq)

        # load every referenced dump ONCE; steps address it by row index.
        # Small caches live device-resident in HBM (zero per-step transfer,
        # ACCURACY_r05: 9.3x the online step rate at 478 frames / 2 GB).
        # Sequence-scale caches (2216 frames = 9.3 GB stage-4 dumps) exceed
        # the chip next to the model + step workspace, so above a budget the
        # cache STREAMS: it stays in host RAM and each dispatch ships only
        # the rows that chunk touches (~4 MB/tuple) as a remapped mini-cache
        # through the same step function.
        referenced = sorted({
            int(i)
            for anc, poss, negs in tuples
            for i in ([anc] + list(np.atleast_1d(poss)) + list(np.atleast_1d(negs)))
        })
        cache_row = {f: r for r, f in enumerate(referenced)}
        first = np.load(osp.join(args.feature_dir, f"{seq_tag}_{referenced[0]:06d}.npz"))
        cache_f = np.zeros((len(referenced),) + first["feats"].shape, np.float32)
        cache_m = np.zeros((len(referenced),) + first["mask"].shape, bool)
        for f, r in cache_row.items():
            d = np.load(osp.join(args.feature_dir, f"{seq_tag}_{f:06d}.npz"))
            cache_f[r], cache_m[r] = d["feats"], d["mask"]
        hbm_budget = float(os.environ.get("LCRNET_HALF_CACHE_HBM_BUDGET", 6e9))
        stream_cache = cache_f.nbytes > hbm_budget
        if stream_cache:
            logger.info(
                f"feature cache: {len(referenced)} frames, "
                f"{cache_f.nbytes / 1e9:.2f} GB > {hbm_budget / 1e9:.1f} GB HBM "
                f"budget — STREAMING from host RAM (per-dispatch mini-cache)")
        else:
            cache_f = jnp.asarray(cache_f)
            cache_m = jnp.asarray(cache_m)
            logger.info(f"feature cache: {len(referenced)} frames, "
                        f"{cache_f.nbytes / 1e9:.2f} GB device-resident")
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
        """Fresh random positives/negatives from the anchor's candidate
        lists EVERY step, as the reference (`dataset_overlap.py:195-207`:
        pos with replacement, neg without).  Fixed first-k tuples overfit
        within epochs and plateau retrieval (measured round 4: training
        loss 0.06 with AUC stuck at 0.15)."""
        anc, poss, negs = tuples[order[start + b]]
        poss = np.atleast_1d(poss).astype(int)
        negs = np.atleast_1d(negs).astype(int)
        idxs = [int(anc)]
        idxs += list(rng.choice(poss, size=args.num_pos, replace=True))
        idxs += list(rng.choice(negs, size=min(args.num_neg, len(negs)),
                                replace=False))
        while len(idxs) < group:  # pad-by-duplication, as the reference
            idxs.append(idxs[-1])
        return idxs

    def augment(points):
        """Reference online-LD per-cloud augmentation
        (`dataset_overlap_online.py:123-143`): gaussian jitter, full-circle
        yaw, isotropic scale, planar shift — independently per cloud, which
        is what forces yaw-invariant descriptors (the rehearsal world's
        second lap is direction-reversed)."""
        t = cfg.train
        pts = points + (rng.random(points.shape) - 0.5) * t.augmentation_noise
        a = rng.random() * 2.0 * np.pi / max(t.augmentation_rotation, 1e-9)
        c, s = np.cos(a), np.sin(a)
        rot = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]], np.float32)
        pts = pts @ rot.T
        scale = t.augmentation_min_scale + rng.random() * (
            t.augmentation_max_scale - t.augmentation_min_scale)
        pts = pts * scale
        return (pts + rng.uniform(-t.augmentation_shift, t.augmentation_shift, 3)
                ).astype(np.float32)

    def make_batch(order, start):
        pts = np.zeros((args.batch_size, group, cap, 3), np.float32)
        msk = np.zeros((args.batch_size, group, cap), bool)
        for b in range(args.batch_size):
            for g, i in enumerate(tuple_indices(order, start, b)):
                cloud = source(i)
                if args.train_mode == "online":
                    cloud = augment(cloud)
                p, m = pad_points(cloud, cap)
                pts[b, g], msk[b, g] = p, m
        return pts, msk

    def make_batch_half(order, start):
        pts = np.zeros((args.batch_size, cap, 3), np.float32)
        msk = np.zeros((args.batch_size, cap), bool)
        rows = np.zeros((args.batch_size, group - 1), np.int32)
        for b in range(args.batch_size):
            idxs = tuple_indices(order, start, b)
            p, m = pad_points(source(idxs[0]), cap)
            pts[b], msk[b] = p, m
            rows[b] = [cache_row[int(i)] for i in idxs[1:]]
        return pts, msk, rows

    build = make_batch_half if half else make_batch

    def minicache(rows, k_steps):
        """Streaming half mode: host-gather the rows this dispatch touches
        into a fixed-capacity mini-cache (static shape — no retraces) and
        remap the row indices into it."""
        cap_rows = k_steps * args.batch_size * (group - 1)
        uniq, inv = np.unique(rows, return_inverse=True)
        sel = np.zeros(cap_rows, np.int64)
        sel[: len(uniq)] = uniq
        return (
            jnp.asarray(cache_f[sel]),
            jnp.asarray(cache_m[sel]),
            inv.reshape(rows.shape).astype(np.int32),
        )

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
                if half:
                    pts_k, msk_k, idx_k = arrays
                    if stream_cache:
                        cf, cm, idx_np = minicache(np.asarray(idx_k), args.chunk)
                        state, metrics = multistep(
                            state, pts_k, msk_k, cf, cm, jnp.asarray(idx_np))
                    else:
                        state, metrics = multistep(
                            state, pts_k, msk_k, cache_f, cache_m, idx_k)
                else:
                    state, metrics = multistep(state, *arrays)
            else:
                arrays = [jnp.asarray(a) for a in build(order, starts[i])]
                i += 1
                if half:
                    pts_1, msk_1, idx_1 = arrays
                    if stream_cache:
                        cf, cm, idx_np = minicache(np.asarray(idx_1), 1)
                        state, metrics = step(
                            state, pts_1, msk_1, cf, cm, jnp.asarray(idx_np))
                    else:
                        state, metrics = step(
                            state, pts_1, msk_1, cache_f, cache_m, idx_1)
                else:
                    state, metrics = step(state, *arrays)
            board.update_from_dict({k: float(v) for k, v in metrics.items()})
        logger.info(f"epoch {epoch + 1}/{args.max_epoch}: {board.format()}")
        if (epoch + 1) % args.save_every == 0 or epoch + 1 == args.max_epoch:
            save_snapshot(osp.join(args.output, "snapshots"), epoch + 1,
                          state.params, state.opt_state)


if __name__ == "__main__":
    main()

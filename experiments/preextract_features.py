#!/usr/bin/env python
"""Pre-extract per-scan encoder features (stage-4 coarse feats).

Parity target: `experiments/loop_detection/preextract/pre_extract_feature.py:23-139`
+ `LCRNet_backbone.py:8-56` — the reference dumps every scan's stage-4
(N_c, 1024) encoder features to disk so its 'half'/'offline' loop-detection
training modes can read cached features instead of running the encoder.

These dumps feed `train_loop_detection.py --train_mode half` (the
reference's throughput mode: encoder forward on the anchor only,
positives/negatives read from the cache) and remain useful for offline
inspection of encoder features.  One npz per scan:
  feats   (N_c, 1024)  stage-4 features (L2-unnormalized, like the reference)
  points  (N_c, 3)     stage-4 coarse points
  mask    (N_c,)       validity

Note: the reference script itself is latently broken (imports a dataset
factory symbol that does not exist — SURVEY.md §2.6); this is the working
equivalent.
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
    ap.add_argument("--seq", default="0", help="sequence id (int or session name)")
    ap.add_argument("--num_frames", type=int, default=None)
    ap.add_argument("--snapshot", default=None)
    ap.add_argument("--output", default="output/preextract")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.datasets import count_frames, make_sequence
    from lcrnet_tpu.data.kitti import pad_points
    from lcrnet_tpu.engine.checkpoint import load_snapshot
    from lcrnet_tpu.models.lcrnet import LCRNet
    from lcrnet_tpu.pipeline import build_batch_pyramid, init_params

    cfg = make_cfg()
    params = init_params(cfg)
    if args.snapshot:
        params = load_snapshot(args.snapshot, template={"params": params})["params"]

    model = LCRNet(cfg)

    def encode(params, points, masks):
        pyramid = build_batch_pyramid(points, masks, cfg)
        feats = pyramid.masks[0][..., None].astype(jnp.float32)
        feats_list = model.apply(
            params, feats, pyramid, 1, method=lambda m, f, p, n: m.encoder(f, p, norm_clouds=n)
        )
        return feats_list[3], pyramid.points[3], pyramid.masks[3]

    encode = jax.jit(encode)

    seq = int(args.seq) if str(args.seq).isdigit() else args.seq
    seq_tag = f"{seq:02d}" if isinstance(seq, int) else str(seq)
    source = make_sequence(
        args.family, args.dataset_root, seq, cfg.backbone.init_voxel_size)
    total = count_frames(source)
    n = total if args.num_frames is None else min(args.num_frames, total)
    os.makedirs(args.output, exist_ok=True)
    cap = cfg.shapes.points[0]
    for i in range(n):
        scan = source(i)
        p, m = pad_points(scan, cap)
        feats, pts_c, msk_c = encode(params, jnp.asarray(p[None]), jnp.asarray(m[None]))
        np.savez_compressed(
            osp.join(args.output, f"{seq_tag}_{i:06d}.npz"),
            feats=np.asarray(feats[0]),
            points=np.asarray(pts_c[0]),
            mask=np.asarray(msk_c[0]),
        )
    print(f"wrote {n} feature dumps to {args.output}")


if __name__ == "__main__":
    main()

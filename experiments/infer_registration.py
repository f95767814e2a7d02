#!/usr/bin/env python
"""Registration inference without GT: dump `pos anc r00..r23` pose text.

Parity target: `experiments/inference/infer_registration.py:15-96`.
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
    ap.add_argument("--pair_file", required=True, help="text with `anc pos` per line")
    ap.add_argument("--snapshot", default=None)
    ap.add_argument("--output", default="output/inference/poses.txt")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.datasets import count_frames, make_sequence
    from lcrnet_tpu.data.kitti import pad_points
    from lcrnet_tpu.engine.checkpoint import load_snapshot
    from lcrnet_tpu.pipeline import init_params, make_pair_forward

    cfg = make_cfg()
    params = init_params(cfg)
    if args.snapshot:
        params = load_snapshot(args.snapshot, template={"params": params})["params"]

    seq = int(args.seq) if str(args.seq).isdigit() else args.seq
    source = make_sequence(
        args.family, args.dataset_root, seq, cfg.backbone.init_voxel_size)
    pairs = np.loadtxt(args.pair_file).reshape(-1, 2).astype(int) if osp.exists(args.pair_file) else []
    fwd = jax.jit(make_pair_forward(cfg, with_global_head=False))

    os.makedirs(osp.dirname(osp.abspath(args.output)), exist_ok=True)
    cap = cfg.shapes.points[0]
    with open(args.output, "w") as f:
        for anc, pos in pairs:
            rp, rm = pad_points(source(int(pos)), cap)
            sp, sm = pad_points(source(int(anc)), cap)
            out = fwd(params, jnp.asarray(rp), jnp.asarray(rm), jnp.asarray(sp), jnp.asarray(sm))
            t = np.asarray(out["estimated_transform"])[:3, :4].reshape(-1)
            f.write(f"{pos} {anc} " + " ".join(f"{v:.8f}" for v in t) + "\n")
    print(f"wrote {len(pairs)} poses to {args.output}")


if __name__ == "__main__":
    main()

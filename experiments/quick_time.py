#!/usr/bin/env python
"""Quick forward/train timing for perf iteration (not the official bench).

Usage: python experiments/quick_time.py [--mode forward|train] [--snapshot DIR]
Prints median per-iteration ms over reps of n_it-dispatch blocks, using the
relay-safe transfer fence (NOTES.md).
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

DEMO_DIR = "/root/reference/demo/data_demo"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="forward", choices=["forward", "train", "pyramid"])
    ap.add_argument("--snapshot", default="output/accuracy_r04d/snapshots")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.kitti import load_scan_npy, pad_points
    from lcrnet_tpu.pipeline import init_params, make_pair_forward

    cfg = make_cfg()
    params = init_params(cfg)
    if args.snapshot and osp.isdir(args.snapshot):
        from lcrnet_tpu.engine.checkpoint import load_snapshot

        params = load_snapshot(args.snapshot, template={"params": params})["params"]
        print(f"weights: {args.snapshot}")

    ref = load_scan_npy(osp.join(DEMO_DIR, "003854.npy"))
    src = load_scan_npy(osp.join(DEMO_DIR, "000958.npy"))
    rp, rm = pad_points(ref, cfg.shapes.points[0])
    sp, sm = pad_points(src, cfg.shapes.points[0])
    rp, rm, sp, sm = map(jnp.asarray, (rp, rm, sp, sm))

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf).ravel()[:1]

    if args.mode == "forward":
        fn = jax.jit(make_pair_forward(cfg))
        run = lambda: fn(params, rp, rm, sp, sm)
    elif args.mode == "pyramid":
        from lcrnet_tpu.pipeline import build_batch_pyramid

        fn = jax.jit(lambda p, m: build_batch_pyramid(p, m, cfg))
        pts, msk = jnp.stack([rp, sp]), jnp.stack([rm, sm])
        run = lambda: fn(pts, msk)
    else:
        from lcrnet_tpu.engine.train import PairBatch, create_train_state, make_train_step

        state = create_train_state(cfg, {"params": params["params"]}, steps_per_epoch=1000)
        step = make_train_step(cfg)
        batch = PairBatch(
            jnp.stack([rp, sp])[None], jnp.stack([rm, sm])[None],
            jnp.eye(4, dtype=jnp.float32)[None])
        key = jax.random.PRNGKey(0)

        def run():
            nonlocal state
            state, m = step(state, batch, key)
            return m["loss"]

    t0 = time.perf_counter()
    sync(run())
    print(f"compile+first: {time.perf_counter() - t0:.1f} s")
    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = None
        for _ in range(args.iters):
            out = run()
        sync(out)
        times.append((time.perf_counter() - t0) / args.iters * 1e3)
    times = sorted(times)
    print(f"{args.mode}: median {np.median(times):.1f} ms  (all: "
          + " ".join(f"{t:.1f}" for t in times) + ")")


if __name__ == "__main__":
    main()

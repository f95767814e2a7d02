#!/usr/bin/env python
"""Per-op attribution for the pair pipeline via jax.profiler.

The reference's profiling story is manual timers around whole steps
(`utils/utils/timer.py`); stage-level wall-timing under the axon relay is
noisy (NOTES.md).  This tool is the accurate path: trace a jitted program
with jax.profiler, then aggregate per-op self-times from the exported
Chrome-trace events, grouped by op name and XLA source attribution — the
methodology that found the three dominant non-compute costs in round 2
(scattered index remap, 1-channel feature gather, partition top_k sort).

Usage:
  python experiments/profile_forward.py --mode forward --iters 8
  python experiments/profile_forward.py --mode train --snapshot <dir>
  python experiments/profile_forward.py --parse-only <trace_dir>

Works on any backend; on TPU the "XLA Ops" track carries device op timings.
"""

import argparse
import glob
import gzip
import json
import os
import os.path as osp
import re
import sys
from collections import defaultdict

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

DEMO_DIR = "/root/reference/demo/data_demo"


def find_trace_files(trace_dir):
    """Trace files of the LATEST profiling run under trace_dir (each
    jax.profiler.trace() session writes plugins/profile/<timestamp>/)."""
    files = sorted(
        set(glob.glob(osp.join(trace_dir, "**", "*.trace.json.gz"), recursive=True))
    )
    runs = defaultdict(list)
    for f in files:
        runs[osp.dirname(f)].append(f)
    if not runs:
        return []
    return runs[max(runs)]  # newest session dir; all its files (multi-host)


def load_events(trace_file):
    with gzip.open(trace_file, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def aggregate(events, track_pattern):
    """Sum durations of complete ('X') events per (track, op-name).

    Returns {track: {op_name: (total_us, count, example_args)}}.
    """
    # pid/tid -> human track names from metadata events
    proc = {}
    thread = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc[e["pid"]] = e["args"].get("name", str(e["pid"]))
            elif e.get("name") == "thread_name":
                thread[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    pat = re.compile(track_pattern)
    out = defaultdict(lambda: defaultdict(lambda: [0.0, 0, {}]))
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        track = f"{proc.get(e['pid'], e['pid'])}/{thread.get((e['pid'], e.get('tid')), '')}"
        if not pat.search(track):
            continue
        slot = out[track][e.get("name", "?")]
        slot[0] += e["dur"]
        slot[1] += 1
        if not slot[2] and e.get("args"):
            slot[2] = e["args"]
    return out


def report(tracks, top=30):
    for track, ops in sorted(tracks.items()):
        total = sum(v[0] for v in ops.values())
        if total <= 0:
            continue
        print(f"\n== {track}: {total / 1e3:.2f} ms total ==")
        rows = sorted(ops.items(), key=lambda kv: -kv[1][0])[:top]
        for name, (dur, count, args) in rows:
            src = args.get("source", args.get("tf_op", ""))
            extra = f"  [{src}]" if src else ""
            print(f"  {dur / 1e3:9.3f} ms  x{count:<5d} {name[:90]}{extra}")


def run_and_trace(args):
    import jax
    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.kitti import load_scan_npy, pad_points
    from lcrnet_tpu.pipeline import init_params, make_pair_forward

    cfg = make_cfg()
    params = init_params(cfg)
    if args.snapshot:
        from lcrnet_tpu.engine.checkpoint import load_snapshot

        params = load_snapshot(args.snapshot, template={"params": params})["params"]

    if osp.isdir(DEMO_DIR):
        ref = load_scan_npy(osp.join(DEMO_DIR, "003854.npy"))
        src = load_scan_npy(osp.join(DEMO_DIR, "000958.npy"))
    else:
        rng = np.random.default_rng(0)
        ref = rng.uniform(-60, 60, (17000, 3)).astype(np.float32)
        src = rng.uniform(-60, 60, (17000, 3)).astype(np.float32)
    cap = cfg.shapes.points[0]
    rp, rm = pad_points(ref, cap)
    sp, sm = pad_points(src, cap)
    rp, rm, sp, sm = map(jnp.asarray, (rp, rm, sp, sm))

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        np.asarray(leaf).ravel()[:1]  # relay-safe fence (NOTES.md)

    if args.mode == "forward":
        fn = jax.jit(make_pair_forward(cfg))
        run = lambda: fn(params, rp, rm, sp, sm)
    elif args.mode == "pyramid":
        from lcrnet_tpu.pipeline import build_batch_pyramid

        fn = jax.jit(lambda p, m: build_batch_pyramid(p, m, cfg))
        pts = jnp.stack([rp, sp])
        msk = jnp.stack([rm, sm])
        run = lambda: fn(pts, msk)
    else:  # train
        from lcrnet_tpu.engine.train import PairBatch, create_train_state, make_train_step

        state = create_train_state(cfg, {"params": params["params"]}, steps_per_epoch=1000)
        step = make_train_step(cfg)
        batch = PairBatch(
            jnp.stack([rp, sp])[None], jnp.stack([rm, sm])[None],
            jnp.eye(4, dtype=jnp.float32)[None])
        import jax.random as jrandom

        key = jrandom.PRNGKey(0)

        def run():
            nonlocal state
            state, metrics = step(state, batch, key)
            return metrics

    sync(run())  # compile outside the trace
    import jax.profiler

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for _ in range(args.iters):
            out = run()
        sync(out)
    print(f"trace written to {args.trace_dir}")
    return args.trace_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["forward", "train", "pyramid"], default="forward")
    ap.add_argument("--snapshot", default=None)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--trace_dir", default="/tmp/lcrnet_trace")
    ap.add_argument("--track", default="TPU|XLA|Axon|device",
                    help="regex over 'process/thread' track names to include")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--parse-only", dest="parse_only", default=None,
                    help="skip running; parse an existing trace directory")
    args = ap.parse_args()

    trace_dir = args.parse_only or run_and_trace(args)
    files = find_trace_files(trace_dir)
    if not files:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    merged = defaultdict(lambda: defaultdict(lambda: [0.0, 0, {}]))
    for f in files:
        for track, ops in aggregate(load_events(f), args.track).items():
            for name, (dur, count, a) in ops.items():
                slot = merged[track][name]
                slot[0] += dur
                slot[1] += count
                slot[2] = slot[2] or a
    report(merged, args.top)


if __name__ == "__main__":
    main()

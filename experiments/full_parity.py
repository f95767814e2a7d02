#!/usr/bin/env python
"""Full-pipeline cross-implementation parity on the real KITTI-00 demo pair.

Executes the reference's OWN full LCRNet (`model_family/LCRNet.py:25-321`,
torch CPU, its own C++ collate extension) and this framework's pair forward
side by side with IDENTICAL weights (reference random init, pushed through
`engine/convert.py`) and identical kernel dispositions / neighbor limits,
then compares everything that is permutation-comparable across the two
designs:

  1. pyramid stage point SETS per cloud (4 stages of voxel subsampling:
     `utils/extensions/cpu/grid_subsampling` vs `ops/grid_subsample.py`)
  2. stage-4 encoder features, aligned point-by-point across
     implementations by coordinate matching (4 KPConv stages + GroupNorm +
     LeakyReLU: `backbone4.py:11-89` vs `models/backbone.py`)
  3. the 256-d global descriptors and their pair L2 distance
     (`LCRNet.py:115-122` NetVLAD head vs `models/netvlad.py`)

The matching/vote stack BELOW the descriptor head is deliberately out of
scope here: the greedy NMS keep-set depends on point iteration order, which
this framework intentionally canonicalizes (x-sorted stages) — those
modules are parity-pinned at module level instead
(`tests/test_torch_parity.py`).  What this adds over the module suite is
end-to-end evidence on REAL scans: the C++ pyramid semantics, the ragged->
padded refactor, and the full encoder stack compose to the same numbers.

Divergence sources that remain (and bound the tolerances):
  - voxel barycenters are summed in different orders (fp assoc.)
  - neighbor rows truncate at `limit` by distance; distance TIES at the
    cut can resolve differently
  - GroupNorm couples the stacked pair in the reference pair model; the
    pair path here does the same (`norm_clouds=2`), so this matches.

Writes FULL_PARITY.json at the repo root and prints a summary.

Deterministic-kernel note: the reference re-randomizes its kernel-point
rotation + noise at every model build (`kernel_points.py:428-455`); both
sides here pin the raw PLY dispositions (`k_015_center_3D.ply`), which is
exactly what `models/kernel_points.set_unit_dispositions` exists for.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
REF_ROOT = "/root/reference"
DEMO_DIR = osp.join(REF_ROOT, "demo", "data_demo")
DISPOSITIONS_PLY = osp.join(
    REF_ROOT, "experiments/lcrnet/modules/kpconv/dispositions/k_015_center_3D.ply"
)


def _match_sets(a: np.ndarray, b: np.ndarray, tol: float):
    """Greedy nearest match of rows of a to rows of b; returns (idx, dists).

    Both sides are expected to hold the same point set up to fp noise, so a
    plain per-row nearest neighbor (no mutual exclusion) suffices — ties
    would mean duplicate points, which voxel subsampling precludes."""
    # chunked to keep the (n, m) distance matrix bounded
    idx = np.empty(len(a), np.int64)
    dd = np.empty(len(a), np.float64)
    step = 512  # bounds the (step, m, 3) broadcast temp to ~200 MB
    for s in range(0, len(a), step):
        d = np.linalg.norm(a[s : s + step, None, :] - b[None, :, :], axis=-1)
        idx[s : s + step] = d.argmin(axis=1)
        dd[s : s + step] = d.min(axis=1)
    return idx, dd


def _contig_tree(torch, obj):
    """The reference's `index_select` calls `.view(-1)` on collated neighbor
    tables, which are non-contiguous slices — make every tensor contiguous
    (the reference's own DataLoader does this implicitly via worker IPC)."""
    if isinstance(obj, torch.Tensor):
        return obj.contiguous()
    if isinstance(obj, list):
        return [_contig_tree(torch, x) for x in obj]
    if isinstance(obj, dict):
        return {k: _contig_tree(torch, v) for k, v in obj.items()}
    return obj


def run_reference(limits, scans):
    """Reference collate + full LCRNet forward; returns per-cloud stage
    points, stage-4 features, and global descriptors."""
    from experiments.baseline_torch import build_ext, install_shims

    install_shims()
    import torch

    torch.set_num_threads(1)
    build_ext()

    # deterministic kernel dispositions: raw PLY, no per-build rotation/noise
    from lcrnet_tpu.models.kernel_points import parse_ply_xyz

    ply = parse_ply_xyz(DISPOSITIONS_PLY)
    import experiments.lcrnet.modules.kpconv.kpconv as ref_kpconv

    ref_kpconv.load_kernels = (
        lambda radius, num_kpoints, dimension=3, fixed="center", lloyd=False: (
            radius * ply
        ).astype(np.float32)
    )

    import experiments.lcrnet.backbone4 as backbone4
    from experiments.lcrnet.config_model import make_cfg as make_cfg_model
    from experiments.lcrnet.data import registration_collate_fn_stack_mode
    from experiments.lcrnet.model_family.LCRNet import create_model

    _orig_rs = backbone4.radius_search
    backbone4.radius_search = lambda *a, **k: _orig_rs(*a, **k).contiguous()

    cfg = make_cfg_model()
    cfg.vis = False
    cfg.neighbor_limits = list(limits)

    torch.manual_seed(7351)
    model = create_model(cfg).eval()

    ref_pts, src_pts = scans
    item = {
        "ref_points": ref_pts,
        "src_points": src_pts,
        "ref_feats": np.ones((ref_pts.shape[0], 1), np.float32),
        "src_feats": np.ones((src_pts.shape[0], 1), np.float32),
        "transform": None,
        "pos_idx": 3854,
        "anc_idx": 958,
    }
    data = registration_collate_fn_stack_mode(
        [item], cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, list(limits),
    )

    data = _contig_tree(torch, data)

    # capture the encoder stage-4 features as they enter the global head
    captured = []
    head = model.GlobalDescritionHEAD

    def _capturing_head(feats_c):
        captured.append(feats_c.detach().clone().numpy())
        return head(feats_c)

    model.GlobalDescritionHEAD = _capturing_head

    with torch.no_grad():
        out = model(data)

    lengths = [l.numpy() for l in data["lengths"]]
    stage_points = []
    for s, pts in enumerate(data["points"]):
        pts = pts.numpy()
        n_ref = int(lengths[s][0])
        stage_points.append((pts[:n_ref], pts[n_ref:]))

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    return {
        "stage_points": stage_points,
        "s4_feats": (captured[0], captured[1]),  # (ref, src), raw pre-normalize
        "desc": (
            out["pos_feature_global"].numpy()[0],
            out["anc_feature_global"].numpy()[0],
        ),
        "state_dict": sd,
    }


def run_ours(limits, scans, state_dict):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.kitti import pad_points
    from lcrnet_tpu.engine.convert import convert_state_dict
    from lcrnet_tpu.models.kernel_points import load_reference_dispositions
    from lcrnet_tpu.models.lcrnet import LCRNet
    from lcrnet_tpu.pipeline import build_batch_pyramid

    load_reference_dispositions(DISPOSITIONS_PLY)

    cfg = make_cfg()
    cfg = dataclasses.replace(
        cfg, shapes=dataclasses.replace(cfg.shapes, neighbor_limits=tuple(limits))
    )
    params = jax.tree.map(jnp.asarray, convert_state_dict(state_dict))

    model = LCRNet(cfg)
    cap = cfg.shapes.points[0]
    rp, rm = pad_points(scans[0], cap)
    sp, sm = pad_points(scans[1], cap)
    pts = jnp.asarray(np.stack([rp, sp]))
    msk = jnp.asarray(np.stack([rm, sm]))

    @jax.jit
    def run(params, pts, msk):
        pyramid = build_batch_pyramid(pts, msk, cfg)
        out, inter = model.apply(
            params, pyramid, jnp.eye(4), training=False,
            capture_intermediates=lambda mdl, name: mdl.name == "encoder",
        )
        return pyramid, out, inter

    pyramid, out, inter = run(params, pts, msk)

    feats_list = inter["intermediates"]["encoder"]["__call__"][0]
    s4 = np.asarray(feats_list[3])  # (2, cap4, 1024)
    stage_points = []
    for s in range(4):
        p = np.asarray(pyramid.points[s])
        m = np.asarray(pyramid.masks[s])
        stage_points.append((p[0][m[0]], p[1][m[1]]))
    m3 = np.asarray(pyramid.masks[3])
    return {
        "stage_points": stage_points,
        "s4_feats": (s4[0][m3[0]], s4[1][m3[1]]),
        "s4_points": (stage_points[3][0], stage_points[3][1]),
        "desc": (
            np.asarray(out["ref_feature_global"]),
            np.asarray(out["src_feature_global"]),
        ),
    }


GT_NPZ = osp.join(REF_ROOT, "assets/data/kitti/registration/mixed/00.npz")
DEMO_FRAMES = [26, 560, 958, 3528, 3854, 4481]


def _pose_errors(est: np.ndarray, gt: np.ndarray):
    """RRE (deg, chordal-equivalent acos trace) + RTE (m)."""
    r = est[:3, :3] @ gt[:3, :3].T
    c = np.clip((np.trace(r) - 1.0) / 2.0, -1.0, 1.0)
    rre = float(np.degrees(np.arccos(c)))
    rte = float(np.linalg.norm(est[:3, 3] - gt[:3, 3]))
    return rre, rte


def run_reference_pose(limits, pairs, scans, state_dict):
    """Reference torch LCRNet with OUR trained weights (reverse-converted)
    on the GT demo pairs: its own C++ collate, vote/NMS, OT, and LGR all the
    way to `estimated_transform` (`model_family/LCRNet.py:258-299`)."""
    from experiments.baseline_torch import build_ext, install_shims

    install_shims()
    import torch

    torch.set_num_threads(max(1, os.cpu_count()))
    build_ext()

    # the torch model must use the SAME kernel dispositions the snapshot was
    # trained under — this framework's seeded repulsion defaults (the PLY
    # override is only for running reference-trained checkpoints; a
    # disposition mismatch silently degrades features and flips marginal
    # pairs — found the hard way, NOTES.md round 4)
    from lcrnet_tpu.models.kernel_points import load_kernel_points

    import experiments.lcrnet.modules.kpconv.kpconv as ref_kpconv

    ref_kpconv.load_kernels = (
        lambda radius, num_kpoints, dimension=3, fixed="center", lloyd=False:
            load_kernel_points(radius, num_kpoints).astype(np.float32)
    )

    import experiments.lcrnet.backbone4 as backbone4
    from experiments.lcrnet.config_model import make_cfg as make_cfg_model
    from experiments.lcrnet.data import registration_collate_fn_stack_mode
    from experiments.lcrnet.model_family.LCRNet import create_model

    _orig_rs = backbone4.radius_search
    backbone4.radius_search = lambda *a, **k: _orig_rs(*a, **k).contiguous()

    cfg = make_cfg_model()
    cfg.vis = False
    cfg.neighbor_limits = list(limits)

    torch.manual_seed(7351)
    model = create_model(cfg).eval()
    load_res = model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state_dict.items()},
        strict=False,
    )
    # only non-parameter buffers may be absent from the converted tree
    unexpected = [k for k in load_res.unexpected_keys]
    assert not unexpected, f"reverse converter emitted unknown keys: {unexpected[:8]}"

    results = []
    for pair in pairs:
        item = {
            "ref_points": scans[pair["pos_idx"]],
            "src_points": scans[pair["anc_idx"]],
            "ref_feats": np.ones((scans[pair["pos_idx"]].shape[0], 1), np.float32),
            "src_feats": np.ones((scans[pair["anc_idx"]].shape[0], 1), np.float32),
            "transform": pair["transform"].astype(np.float32),
            "pos_idx": pair["pos_idx"],
            "anc_idx": pair["anc_idx"],
        }
        data = registration_collate_fn_stack_mode(
            [item], cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
            cfg.backbone.init_radius, list(limits),
        )
        data = _contig_tree(torch, data)
        with torch.no_grad():
            out = model(data)
        est = out["estimated_transform"].numpy().reshape(4, 4)
        rre, rte = _pose_errors(est, pair["transform"])
        desc_l2 = float(np.linalg.norm(
            out["pos_feature_global"].numpy()[0] - out["anc_feature_global"].numpy()[0]))
        results.append({
            "anc_idx": int(pair["anc_idx"]), "pos_idx": int(pair["pos_idx"]),
            "RRE": rre, "RTE": rte, "desc_L2": desc_l2,
            "estimated_transform": est.tolist(),
        })
    return results


def run_ours_pose(limits, pairs, scans, params):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.kitti import pad_points
    from lcrnet_tpu.models.lcrnet import LCRNet
    from lcrnet_tpu.pipeline import build_batch_pyramid

    # NO disposition override: the snapshot trained under the seeded defaults
    cfg = make_cfg()
    cfg = dataclasses.replace(
        cfg, shapes=dataclasses.replace(cfg.shapes, neighbor_limits=tuple(limits))
    )
    model = LCRNet(cfg)
    cap = cfg.shapes.points[0]

    @jax.jit
    def run(params, pts, msk):
        pyramid = build_batch_pyramid(pts, msk, cfg)
        return model.apply(params, pyramid, jnp.eye(4), training=False)

    results = []
    for pair in pairs:
        rp, rm = pad_points(scans[pair["pos_idx"]], cap)
        sp, sm = pad_points(scans[pair["anc_idx"]], cap)
        out = run(params, jnp.asarray(np.stack([rp, sp])),
                  jnp.asarray(np.stack([rm, sm])))
        est = np.asarray(out["estimated_transform"]).reshape(4, 4)
        rre, rte = _pose_errors(est, pair["transform"])
        desc_l2 = float(np.linalg.norm(
            np.asarray(out["ref_feature_global"]) - np.asarray(out["src_feature_global"])))
        results.append({
            "anc_idx": int(pair["anc_idx"]), "pos_idx": int(pair["pos_idx"]),
            "RRE": rre, "RTE": rte, "desc_L2": desc_l2,
            "estimated_transform": est.tolist(),
        })
    return results


def synthetic_pose_pairs(dataset_root, family, seq, num_pairs, seed=7351,
                         min_baseline=2.0, max_baseline=9.0, min_gap=200):
    """Sample GT pose pairs from a generated sequence (the statistical
    pose-parity population: n >= 20 instead of the 3 shipped demo pairs).

    Pairs are revisits: frame i paired with an earlier frame j whose
    position is within [min_baseline, max_baseline] m and at least min_gap
    frames older — the loop-closure geometry the demo pairs exhibit.
    Transforms follow the pair-file convention (src = anc aligned onto
    ref = pos)."""
    from lcrnet_tpu.data.datasets import make_sequence
    from lcrnet_tpu.data.kitti import relative_transform

    from lcrnet_tpu.config import make_cfg as _mk

    source = make_sequence(family, dataset_root, seq,
                           _mk().backbone.init_voxel_size)
    poses = source.poses()
    positions = poses[:, :3, 3]
    rng = np.random.default_rng(seed)
    candidates = []
    for i in range(len(poses)):
        earlier = positions[: max(i - min_gap, 0)]
        if not len(earlier):
            continue
        d = np.linalg.norm(earlier - positions[i], axis=1)
        js = np.nonzero((d >= min_baseline) & (d <= max_baseline))[0]
        if len(js):
            candidates.append((i, int(rng.choice(js))))
    assert len(candidates) >= num_pairs, (
        f"only {len(candidates)} revisit pairs in the sequence")
    sel = rng.choice(len(candidates), num_pairs, replace=False)
    pairs, scans = [], {}
    for ci in sorted(sel):
        i, j = candidates[ci]
        pairs.append({
            "anc_idx": i, "pos_idx": j,
            "transform": relative_transform(poses[j], poses[i]).astype(np.float32),
        })
        for f in (i, j):
            if f not in scans:
                scans[f] = source(f)
    return scans, pairs


def pose_parity(limits, snapshot, out_path, scans=None, pairs=None,
                tag="pose_parity"):
    """Cross-implementation pose parity with TRAINED weights: run this
    framework's snapshot through the reverse converter into the reference's
    own torch LCRNet, execute both full pipelines on GT pairs (default: the
    3 demo pairs; pass scans/pairs for a synthetic population), and compare
    pose errors + descriptor distances."""
    import jax.numpy as jnp
    import jax

    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.data.kitti import load_pair_npz_mixed, load_scan_npy
    from lcrnet_tpu.engine.checkpoint import load_snapshot
    from lcrnet_tpu.engine.convert import convert_params_to_state_dict
    from lcrnet_tpu.pipeline import init_params

    cfg = make_cfg()
    params = init_params(cfg)
    params = load_snapshot(snapshot, template={"params": params})["params"]

    if scans is None:
        scans = {f: load_scan_npy(osp.join(DEMO_DIR, f"{f:06d}.npy"))
                 for f in DEMO_FRAMES}
        pairs = load_pair_npz_mixed(GT_NPZ, frames=set(DEMO_FRAMES))

    print(f"[pose 1/3] JAX pair forward on {len(pairs)} GT pairs ...", flush=True)
    ours = run_ours_pose(limits, pairs, scans, jax.tree.map(jnp.asarray, params))
    print("[pose 2/3] reverse-converting + reference torch LCRNet ...", flush=True)
    sd = convert_params_to_state_dict(params)
    ref = run_reference_pose(limits, pairs, scans, sd)

    print("[pose 3/3] comparing ...", flush=True)
    rows = []
    for r, o in zip(ref, ours):
        assert (r["anc_idx"], r["pos_idx"]) == (o["anc_idx"], o["pos_idx"])
        # est-vs-est: the direct cross-implementation pose delta, robust to
        # GT-row quality (both estimates compared to each other)
        e_r = np.asarray(r["estimated_transform"])
        e_o = np.asarray(o["estimated_transform"])
        rre_rel, rte_rel = _pose_errors(e_r, e_o)
        rows.append({
            "pair": [r["anc_idx"], r["pos_idx"]],
            "RRE_est_vs_est": round(rre_rel, 4),
            "RTE_est_vs_est_cm": round(rte_rel * 100, 2),
            "RRE_torch": round(r["RRE"], 4), "RRE_jax": round(o["RRE"], 4),
            "RRE_abs_diff": round(abs(r["RRE"] - o["RRE"]), 4),
            "RTE_torch_cm": round(r["RTE"] * 100, 2),
            "RTE_jax_cm": round(o["RTE"] * 100, 2),
            "RTE_abs_diff_cm": round(abs(r["RTE"] - o["RTE"]) * 100, 2),
            "desc_L2_torch": round(r["desc_L2"], 5),
            "desc_L2_jax": round(o["desc_L2"], 5),
            "desc_L2_rel_diff": round(
                abs(r["desc_L2"] - o["desc_L2"]) / max(r["desc_L2"], 1e-9), 4),
        })
    rel_rre = [r["RRE_est_vs_est"] for r in rows]
    rel_rte = [r["RTE_est_vs_est_cm"] for r in rows]
    report = {
        "snapshot": snapshot, "limits": list(limits), "n": len(rows),
        "RRE_est_vs_est_median": round(float(np.median(rel_rre)), 4),
        "RRE_est_vs_est_p90": round(float(np.percentile(rel_rre, 90)), 4),
        "RRE_est_vs_est_max": round(float(np.max(rel_rre)), 4),
        "RTE_est_vs_est_cm_median": round(float(np.median(rel_rte)), 2),
        "RTE_est_vs_est_cm_max": round(float(np.max(rel_rte)), 2),
        "pairs": rows,
    }
    if osp.exists(out_path):
        with open(out_path) as f:
            full = json.load(f)
    else:
        full = {}
    full[tag] = report
    with open(out_path, "w") as f:
        json.dump(full, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "pairs"}, indent=1))
    print(json.dumps(rows, indent=1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--limits", default=None,
                    help="comma neighbor limits (default: shipped calibrated)")
    ap.add_argument("--out", default=osp.join(REPO, "FULL_PARITY.json"))
    ap.add_argument("--snapshot", default=None,
                    help="trained flax snapshot dir: run the POSE parity "
                         "mode (reverse-convert into the reference torch "
                         "model, compare RRE/RTE/descriptor per GT pair) "
                         "instead of the random-weights feature parity")
    ap.add_argument("--synthetic_pairs", type=int, default=0,
                    help="pose mode: sample this many revisit GT pairs from "
                         "--dataset_root instead of the 3 demo pairs "
                         "(statistical parity, stored as "
                         "pose_parity_synthetic)")
    ap.add_argument("--dataset_root", default=None)
    ap.add_argument("--family", default="ford")
    ap.add_argument("--seq", default="1")
    args = ap.parse_args()

    if args.snapshot:
        from lcrnet_tpu.config import make_cfg

        limits = (
            tuple(int(x) for x in args.limits.split(","))
            if args.limits
            else make_cfg().shapes.neighbor_limits
        )
        scans = pairs = None
        tag = "pose_parity"
        if args.synthetic_pairs:
            assert args.dataset_root, "--synthetic_pairs needs --dataset_root"
            seq = int(args.seq) if str(args.seq).isdigit() else args.seq
            scans, pairs = synthetic_pose_pairs(
                args.dataset_root, args.family, seq, args.synthetic_pairs)
            tag = "pose_parity_synthetic"
        pose_parity(limits, args.snapshot, args.out, scans=scans, pairs=pairs,
                    tag=tag)
        return

    from lcrnet_tpu.config import make_cfg

    limits = (
        tuple(int(x) for x in args.limits.split(","))
        if args.limits
        else make_cfg().shapes.neighbor_limits
    )

    ref_scan = np.load(osp.join(DEMO_DIR, "003854.npy"))[:, :3].astype(np.float32)
    src_scan = np.load(osp.join(DEMO_DIR, "000958.npy"))[:, :3].astype(np.float32)
    scans = (ref_scan, src_scan)

    print(f"[1/3] reference torch full LCRNet (limits={limits}) ...", flush=True)
    ref = run_reference(limits, scans)
    print("[2/3] converting weights + running the JAX pair forward ...", flush=True)
    ours = run_ours(limits, scans, ref["state_dict"])

    print("[3/3] comparing ...", flush=True)
    report = {"limits": list(limits), "stages": [], "s4": {}, "descriptor": {}}

    # ---- pyramid stage sets
    for s in range(4):
        row = {"stage": s}
        for ci, cname in ((0, "ref"), (1, "src")):
            a = ref["stage_points"][s][ci]
            b = ours["stage_points"][s][ci]
            row[f"{cname}_count_torch"] = int(len(a))
            row[f"{cname}_count_jax"] = int(len(b))
            if len(a) == len(b):
                idx, dd = _match_sets(a, b, 1e-4)
                row[f"{cname}_max_match_dist"] = float(dd.max())
                row[f"{cname}_bijective"] = bool(len(np.unique(idx)) == len(b))
        report["stages"].append(row)

    # ---- stage-4 features, aligned by coordinates
    for ci, cname in ((0, "ref"), (1, "src")):
        pts_t = ref["stage_points"][3][ci]
        f_t = ref["s4_feats"][ci]
        pts_j = ours["s4_points"][ci]
        f_j = ours["s4_feats"][ci]
        if len(pts_t) != len(pts_j):
            report["s4"][cname] = {"error": "count mismatch"}
            continue
        idx, dd = _match_sets(pts_t, pts_j, 1e-4)
        fa = f_t
        fb = f_j[idx]
        denom = np.maximum(np.abs(fa), 1e-3)
        rel = np.abs(fa - fb) / denom
        cos = np.sum(fa * fb, -1) / np.maximum(
            np.linalg.norm(fa, axis=-1) * np.linalg.norm(fb, axis=-1), 1e-12
        )
        report["s4"][cname] = {
            "n": int(len(fa)),
            "max_abs_diff": float(np.abs(fa - fb).max()),
            "mean_abs_diff": float(np.abs(fa - fb).mean()),
            "p99_rel_diff": float(np.quantile(rel, 0.99)),
            "min_row_cosine": float(cos.min()),
            "max_match_dist": float(dd.max()),
        }

    # ---- descriptors
    for ci, cname in ((0, "ref"), (1, "src")):
        a, b = ref["desc"][ci], ours["desc"][ci]
        report["descriptor"][cname] = {
            "max_abs_diff": float(np.abs(a - b).max()),
            "cosine": float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))),
        }
    d_t = float(np.linalg.norm(ref["desc"][0] - ref["desc"][1]))
    d_j = float(np.linalg.norm(ours["desc"][0] - ours["desc"][1]))
    report["descriptor"]["pair_L2_torch"] = d_t
    report["descriptor"]["pair_L2_jax"] = d_j
    report["descriptor"]["pair_L2_abs_diff"] = abs(d_t - d_j)

    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()

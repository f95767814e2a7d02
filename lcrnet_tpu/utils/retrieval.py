"""Loop-closure retrieval: descriptor database scan + PR metrics.

Parity target: `experiments/loop_detection/eval_loop_detection_overlap_dataset.py:14-261`.
The reference rebuilds a faiss IVFFlat index *per query frame* (`:183-215` —
flagged as a hot loop in SURVEY.md §3.3); here the whole sequence-level
retrieval is one jitted masked distance matrix + top-k:

  - database: (N, 256) L2-normalized descriptors
  - causal mask: query i may only match frames j <= i - exclusion (100)
  - top-k by L2 distance = top-k by inner product (normalized vectors)

Metrics mirror the reference eval: P/R curve from a threshold sweep on the
top-1 distance vs the overlap ground truth, F1max, AUC (trapezoidal over the
PR curve, as sklearn's average-precision-style integration), Recall@1 and
Recall@1%.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_BIG = 1.0e12


def causal_topk_search(
    descriptors: jnp.ndarray,
    k: int,
    exclusion: int = 100,
    start: int = 0,
    block: int = 256,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """For each frame i, the top-k nearest database frames j <= i - exclusion.

    Returns (distances (N, k) squared-L2, indices (N, k)); rows with no
    eligible candidates get distance _BIG.
    """
    n, d = descriptors.shape
    k = min(k, n)  # tiny sequences: the database can't hold k candidates
    pad = (-n) % block
    q = jnp.pad(descriptors, ((0, pad), (0, 0)))
    row_ids = jnp.pad(jnp.arange(n), (0, pad), constant_values=-1)

    def one_block(args):
        qb, rb = args
        # pinned: loop/non-loop L2 margins are ~0.03 while bf16 input
        # rounding perturbs d2 by ~0.008 (NOTES.md bf16 trap class)
        sims = jnp.matmul(qb, descriptors.T, precision=jax.lax.Precision.HIGHEST)
        d2 = jnp.maximum(2.0 - 2.0 * sims, 0.0)
        eligible = jnp.arange(n)[None, :] <= rb[:, None] - exclusion
        d2 = jnp.where(eligible, d2, _BIG)
        neg, idx = jax.lax.top_k(-d2, k)
        return -neg, idx

    dists, idx = jax.lax.map(
        one_block, (q.reshape(-1, block, d), row_ids.reshape(-1, block))
    )
    return dists.reshape(-1, k)[:n], idx.reshape(-1, k)[:n]


def evaluate_loop_detection(
    descriptors: np.ndarray,
    gt_positives: list,
    exclusion: int = 100,
    start_frame: int = 150,
    topk: int = 50,
    recall_pct_k: int = 45,
    mesh=None,
) -> Dict[str, float]:
    """Full retrieval eval over a sequence.

    Args:
      descriptors: (N, 256) normalized.
      gt_positives: per-frame list/array of ground-truth loop frame indices
        (frames with overlap > 0.3 in the reference GT files).
      start_frame: first query frame (reference `:183` starts at 150 or once
        the database holds >= exclusion frames).
      recall_pct_k: the `1%` candidate count (45 for KITTI-00, 38 for Ford).
      mesh: optional jax Mesh — shards the O(N^2 d) database scan across the
        mesh's 'dp' axis (`parallel/retrieval.py`), exact same results.

    Returns dict with F1max, AUC, Recall@1, Recall@1pct, plus the raw
    top-1 distances for downstream dumps.
    """
    import time as _time

    n = len(descriptors)
    # honest "1%" candidate count for THIS sequence, alongside the
    # reference's fixed k (45 = 1% of KITTI-00's 4541 frames) for
    # cross-reference comparability — on shorter sequences the fixed k
    # overstates R@1% (45 candidates of a 478-frame DB is ~10%)
    honest_k = max(1, round(0.01 * n))
    k_search = max(topk, recall_pct_k, honest_k)
    t0 = _time.perf_counter()
    if mesh is not None:
        from lcrnet_tpu.parallel.retrieval import sharded_causal_topk_search

        dists, idx = sharded_causal_topk_search(
            np.asarray(descriptors), k=k_search, exclusion=exclusion, mesh=mesh
        )
    else:
        dists, idx = causal_topk_search(
            jnp.asarray(descriptors), k=k_search, exclusion=exclusion
        )
    dists = np.asarray(dists)
    idx = np.asarray(idx)
    scan_seconds = _time.perf_counter() - t0

    has_gt = np.array([len(gt_positives[i]) > 0 for i in range(n)])
    queries = np.array(
        [i for i in range(start_frame, n) if dists[i, 0] < _BIG / 2], dtype=np.int64
    )

    # threshold sweep on top-1 distance (reference `compute_PR_overlap`:66-121)
    # — vectorized: (T, Q) prediction matrix instead of the reference's
    # per-frame faiss rebuild + per-threshold Python loop
    top1_dist = dists[:, 0]
    top1_idx = idx[:, 0]
    top1_correct = np.array(
        [top1_idx[i] in set(gt_positives[i]) for i in range(n)]
    )
    thresholds = np.arange(0.0, 1.01, 0.01)
    if len(queries):
        q_dist = top1_dist[queries]                       # (Q,)
        q_correct = top1_correct[queries]
        q_has_gt = has_gt[queries]
        pred_pos = q_dist[None, :] < thresholds[:, None]  # (T, Q)
        tp = (pred_pos & q_correct[None, :]).sum(axis=1)
        fp = (pred_pos & ~q_correct[None, :]).sum(axis=1)
        fn_ = (~pred_pos & q_has_gt[None, :]).sum(axis=1)
        keep = (tp + fp > 0) & (tp + fn_ > 0)
        precisions = (tp[keep] / np.maximum(tp[keep] + fp[keep], 1)).astype(np.float64)
        recalls = (tp[keep] / np.maximum(tp[keep] + fn_[keep], 1)).astype(np.float64)
    else:
        precisions = np.zeros(0)
        recalls = np.zeros(0)

    if len(precisions) == 0:
        return {
            "F1max": 0.0, "AUC": 0.0, "Recall@1": 0.0, "Recall@1pct": 0.0,
            "Recall@1pct_honest": 0.0, "honest_k": honest_k,
            "db_scan_seconds": scan_seconds,
            "precisions": precisions, "recalls": recalls,
            "top1_distances": top1_dist, "top1_indices": top1_idx,
        }

    f1 = 2 * precisions * recalls / np.maximum(precisions + recalls, 1e-12)
    order = np.argsort(recalls)
    r_sorted = recalls[order]
    p_sorted = precisions[order]
    # anchor the curve at recall 0 so a degenerate perfect sweep (single
    # recall level) still integrates correctly
    r_sorted = np.concatenate([[0.0], r_sorted])
    p_sorted = np.concatenate([[p_sorted[0]], p_sorted])
    auc = float(np.trapezoid(p_sorted, r_sorted))

    # Recall@1 / Recall@1% over queries that have GT loops
    gt_queries = [i for i in queries if has_gt[i]]
    r1 = float(np.mean([top1_correct[i] for i in gt_queries])) if gt_queries else 0.0
    rpct = (
        float(
            np.mean(
                [
                    len(set(idx[i, :recall_pct_k]) & set(gt_positives[i])) > 0
                    for i in gt_queries
                ]
            )
        )
        if gt_queries
        else 0.0
    )
    r_honest = (
        float(
            np.mean(
                [
                    len(set(idx[i, :honest_k]) & set(gt_positives[i])) > 0
                    for i in gt_queries
                ]
            )
        )
        if gt_queries
        else 0.0
    )
    return {
        "F1max": float(f1.max()),
        "AUC": auc,
        "Recall@1": r1,
        "Recall@1pct": rpct,
        "Recall@1pct_honest": r_honest,
        "honest_k": honest_k,
        "db_scan_seconds": scan_seconds,
        # raw curves/artifacts (reference dumps predicted_des_L2_dis.npz +
        # PRC.png; matplotlib-free here — arrays for downstream plotting)
        "precisions": precisions,
        "recalls": recalls,
        "top1_distances": top1_dist,
        "top1_indices": top1_idx,
    }


def save_predicted_distances(path: str, results: Dict, start_frame: int = 150):
    """Write the reference's `predicted_des_L2_dis.npz` artifact
    (`eval_loop_detection_overlap_dataset.py:216-219`): one unnamed array of
    (query_idx, retrieved_idx, L2_distance) rows, top-1 per query."""
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    d = np.asarray(results["top1_distances"])
    idx = np.asarray(results["top1_indices"])
    rows = [
        (float(i), float(idx[i]), float(d[i]))
        for i in range(start_frame, len(d))
        if d[i] < _BIG / 2
    ]
    np.savez_compressed(path, np.asarray(rows, dtype=np.float64))


def save_retrieval_artifacts(path: str, results: Dict):
    """Persist the PR sweep + top-1 tables (reference
    `eval_loop_detection_overlap_dataset.py:255-259` npz dump parity)."""
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(
        path,
        precisions=results.get("precisions", np.zeros(0)),
        recalls=results.get("recalls", np.zeros(0)),
        top1_distances=results.get("top1_distances", np.zeros(0)),
        top1_indices=results.get("top1_indices", np.zeros(0)),
        F1max=results["F1max"],
        AUC=results["AUC"],
    )


def save_pr_curve_png(path: str, results: Dict) -> bool:
    """Render the precision-recall curve to PNG (reference saves `PRC.png`,
    `eval_loop_detection_overlap_dataset.py:249-253`).  matplotlib-optional:
    returns False (no file) when it is unavailable."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return False
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    r = np.asarray(results.get("recalls", np.zeros(0)))
    p = np.asarray(results.get("precisions", np.zeros(0)))
    order = np.argsort(r)
    fig, ax = plt.subplots(figsize=(5, 4))
    ax.plot(r[order], p[order], marker=".", linewidth=1.2)
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1.02)
    ax.set_ylim(0, 1.02)
    ax.set_title(f"AUC {results['AUC']:.3f}  F1max {results['F1max']:.3f}")
    ax.grid(True, alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
    return True

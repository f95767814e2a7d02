"""Tests for the retrieval database and loop-detection metrics."""

import numpy as np
import jax.numpy as jnp

from lcrnet_tpu.utils.retrieval import causal_topk_search, evaluate_loop_detection
from lcrnet_tpu.utils.metrics import (
    compute_registration_error,
    compute_inlier_ratio,
    registration_recall,
)

from oracles import random_se3


def test_causal_topk_respects_exclusion(rng):
    n, d = 300, 16
    desc = rng.normal(size=(n, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    dists, idx = causal_topk_search(jnp.asarray(desc), k=5, exclusion=100)
    dists, idx = np.asarray(dists), np.asarray(idx)
    for i in range(n):
        eligible = idx[i][dists[i] < 1e11]
        assert np.all(eligible <= i - 100)
    # frame < exclusion has no candidates
    assert np.all(dists[50] > 1e11)


def test_causal_topk_finds_duplicate(rng):
    n, d = 250, 8
    desc = rng.normal(size=(n, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    desc[200] = desc[40]  # exact revisit
    dists, idx = causal_topk_search(jnp.asarray(desc), k=3, exclusion=100)
    assert int(np.asarray(idx)[200, 0]) == 40
    assert float(np.asarray(dists)[200, 0]) < 1e-5


def test_evaluate_loop_detection_perfect(rng):
    """Clustered descriptors revisiting earlier places -> near-perfect PR."""
    n, d = 400, 32
    place = rng.normal(size=(20, d)).astype(np.float32)
    place /= np.linalg.norm(place, axis=1, keepdims=True)
    desc = np.zeros((n, d), np.float32)
    assign = np.zeros(n, np.int64)
    for i in range(n):
        assign[i] = (i // 10) % 20  # revisit every 200 frames
        noisy = place[assign[i]] + rng.normal(scale=0.01, size=d)
        desc[i] = noisy / np.linalg.norm(noisy)
    gt = []
    for i in range(n):
        prev = np.nonzero(assign[: max(i - 100 + 1, 0)] == assign[i])[0]
        gt.append(list(prev))
    res = evaluate_loop_detection(desc, gt, exclusion=100, start_frame=150, topk=10, recall_pct_k=5)
    assert res["Recall@1"] > 0.95
    assert res["F1max"] > 0.9
    assert res["AUC"] > 0.8


def test_registration_error_identity(rng):
    t = random_se3(rng)
    res = compute_registration_error(t, t)
    assert res["RRE"] < 1e-5 and res["RTE"] < 1e-9


def test_registration_error_known_yaw():
    gt = np.eye(4)
    est = np.eye(4)
    th = np.radians(10.0)
    est[:3, :3] = [[np.cos(th), -np.sin(th), 0], [np.sin(th), np.cos(th), 0], [0, 0, 1]]
    res = compute_registration_error(gt, est)
    np.testing.assert_allclose(res["RRE"], 10.0, atol=1e-5)
    np.testing.assert_allclose(res["Rz"], 10.0, atol=1e-5)
    np.testing.assert_allclose(res["Rx"], 0.0, atol=1e-5)


def test_inlier_ratio(rng):
    src = rng.normal(size=(100, 3))
    t = random_se3(rng)
    ref = src @ t[:3, :3].T + t[:3, 3]
    ref[:30] += 5.0  # 30 outliers
    ir = compute_inlier_ratio(ref, src, t, radius=0.6)
    np.testing.assert_allclose(ir, 0.7, atol=1e-6)


def test_registration_recall():
    results = [
        {"RRE": 0.1, "RTE": 0.05, "Rz": 0.1},
        {"RRE": 10.0, "RTE": 0.1, "Rz": 9.0},   # rotation failure
        {"RRE": 0.2, "RTE": 3.0, "Rz": 0.2},    # translation failure
        {"RRE": 1.0, "RTE": 1.0, "Rz": 0.9},
    ]
    agg = registration_recall(results)
    np.testing.assert_allclose(agg["RR"], 50.0)
    np.testing.assert_allclose(agg["RRE"], 0.55)


def _retrieval_oracle(top1_dist, top1_correct, has_gt, queries):
    """Straightforward per-threshold loop oracle (the pre-vectorization
    semantics, mirroring reference `compute_PR_overlap`:66-121)."""
    precisions, recalls = [], []
    for thr in np.arange(0.0, 1.01, 0.01):
        tp = fp = fn_ = 0
        for i in queries:
            if top1_dist[i] < thr:
                if top1_correct[i]:
                    tp += 1
                else:
                    fp += 1
            elif has_gt[i]:
                fn_ += 1
        if tp + fp > 0 and tp + fn_ > 0:
            precisions.append(tp / (tp + fp))
            recalls.append(tp / (tp + fn_))
    return np.array(precisions), np.array(recalls)


def test_evaluate_loop_detection_sequence_scale(rng):
    """KITTI-00-scale synthetic sequence (4000 frames, planted loops):
    the vectorized threshold sweep must match the loop oracle exactly, and
    the planted loop structure must be detected (high AUC/R@1)."""
    n, d = 4000, 64
    # base descriptors: slowly drifting random walk, so nearby frames are
    # similar but far frames are not
    desc = rng.normal(size=(n, d)).astype(np.float32)
    gt = [np.zeros(0)] * n
    # plant 200 loop closures: frame i revisits frame i - 1500
    loop_queries = range(2000, 2200)
    for i in loop_queries:
        j = i - 1500
        desc[i] = desc[j] + rng.normal(scale=0.05, size=d).astype(np.float32)
        gt[i] = np.arange(j - 2, j + 3)
    desc = desc / np.linalg.norm(desc, axis=1, keepdims=True)

    res = evaluate_loop_detection(desc, gt, exclusion=100, start_frame=150)
    assert res["AUC"] > 0.9
    assert res["Recall@1"] > 0.95
    assert res["F1max"] > 0.9

    # exact equivalence with the python-loop oracle
    top1_dist = res["top1_distances"]
    top1_idx = res["top1_indices"]
    top1_correct = np.array([top1_idx[i] in set(np.asarray(gt[i])) for i in range(n)])
    has_gt = np.array([len(gt[i]) > 0 for i in range(n)])
    queries = [i for i in range(150, n) if top1_dist[i] < 1e6]
    p_o, r_o = _retrieval_oracle(top1_dist, top1_correct, has_gt, queries)
    np.testing.assert_allclose(res["precisions"], p_o, atol=1e-12)
    np.testing.assert_allclose(res["recalls"], r_o, atol=1e-12)


def test_save_predicted_distances_format(tmp_path, rng):
    """Reference artifact parity: (query, retrieved, distance) rows, arr_0,
    reshapeable to (N, 3) exactly as `compute_topN` consumes it."""
    from lcrnet_tpu.utils.retrieval import save_predicted_distances

    n, d = 400, 32
    desc = rng.normal(size=(n, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    gt = [np.zeros(0)] * n
    res = evaluate_loop_detection(desc, gt, exclusion=100, start_frame=150)
    p = str(tmp_path / "predicted_des_L2_dis.npz")
    save_predicted_distances(p, res)
    arr = np.load(p)["arr_0"].astype("float32").reshape(-1, 3)
    assert len(arr) == n - 150
    assert (arr[:, 0] >= 150).all()
    assert (arr[:, 2] >= 0).all()


def test_save_pr_curve_png(tmp_path, rng):
    """PRC.png parity artifact (reference
    `eval_loop_detection_overlap_dataset.py:249-253`)."""
    from lcrnet_tpu.utils.retrieval import save_pr_curve_png

    n, d = 300, 16
    desc = rng.normal(size=(n, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    gt = [np.zeros(0)] * n
    for i in range(250, 260):
        desc[i] = desc[i - 200]
        gt[i] = np.asarray([i - 200])
    res = evaluate_loop_detection(desc, gt, exclusion=100, start_frame=150)
    p = str(tmp_path / "PRC.png")
    wrote = save_pr_curve_png(p, res)
    import os

    assert wrote == os.path.exists(p)
    if wrote:
        assert os.path.getsize(p) > 1000


def test_evaluate_loop_detection_tiny_sequence(rng):
    """Sequences shorter than the top-k must not crash (found by driving
    the test_loop_detection CLI on a 4-frame directory): k clamps to N."""
    n, d = 4, 16
    desc = rng.normal(size=(n, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    desc[3] = desc[1]
    gt = [np.zeros(0)] * n
    gt[3] = np.asarray([1])
    res = evaluate_loop_detection(desc, gt, exclusion=1, start_frame=0)
    assert res["Recall@1"] == 1.0


def test_sharded_causal_topk_matches_single_device(rng):
    """Database-sharded mesh search is exact vs the single-device scan:
    same distances AND same candidate sets (8-device CPU mesh, database
    rows not divisible by the mesh, k spanning shard boundaries)."""
    import jax

    from lcrnet_tpu.parallel.mesh import make_mesh
    from lcrnet_tpu.parallel.retrieval import sharded_causal_topk_search
    from lcrnet_tpu.utils.retrieval import causal_topk_search

    n, d, k = 203, 32, 7  # 203 = 8*25 + 3: ragged shards exercise padding
    desc = rng.normal(size=(n, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)

    ref_d, ref_i = causal_topk_search(jax.numpy.asarray(desc), k, exclusion=20)
    ref_d, ref_i = np.asarray(ref_d), np.asarray(ref_i)

    mesh = make_mesh(dp=8)
    got_d, got_i = sharded_causal_topk_search(desc, k, exclusion=20, mesh=mesh)

    assert got_d.shape == (n, k) and got_i.shape == (n, k)
    np.testing.assert_allclose(got_d, ref_d, rtol=1e-5, atol=1e-6)
    # indices may permute only among exact-tie distances; with random
    # descriptors ties don't occur, so require identical candidates
    real = ref_d < 1e11
    np.testing.assert_array_equal(got_i[real], ref_i[real])


def test_sharded_causal_topk_k_exceeds_candidates(rng):
    """k larger than any frame's eligible database: rows pad with _BIG."""
    import jax

    from lcrnet_tpu.parallel.mesh import make_mesh
    from lcrnet_tpu.parallel.retrieval import sharded_causal_topk_search

    n, d = 12, 8
    desc = rng.normal(size=(n, d)).astype(np.float32)
    desc /= np.linalg.norm(desc, axis=1, keepdims=True)
    mesh = make_mesh(dp=8)
    dists, idx = sharded_causal_topk_search(desc, k=5, exclusion=4, mesh=mesh)
    assert dists.shape == (12, 5)
    # frame 11 has 8 eligible candidates (0..7): all 5 real
    assert np.all(dists[11] < 1e11)
    # frame 4 has exactly one eligible candidate (frame 0)
    assert dists[4, 0] < 1e11 and idx[4, 0] == 0 and np.all(dists[4, 1:] > 1e11)
    # frames before the exclusion horizon have none
    assert np.all(dists[:4] > 1e11)

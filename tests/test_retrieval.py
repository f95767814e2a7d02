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

"""Native correspondence-RANSAC tests (reference estimator:
`utils/utils/open3d.py:145-175` via `experiments/registration/eval.py:176-185`)."""

import numpy as np
import jax
import jax.numpy as jnp

from lcrnet_tpu.ops.procrustes import weighted_procrustes
from lcrnet_tpu.ops.ransac import correspondence_ransac

from oracles import random_se3


def _corrupted_correspondences(rng, n=256, outlier_frac=0.6, noise=0.02):
    t = random_se3(rng).astype(np.float32)
    src = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    ref = src @ t[:3, :3].T + t[:3, 3]
    ref += rng.normal(scale=noise, size=ref.shape).astype(np.float32)
    n_out = int(n * outlier_frac)
    out_idx = rng.choice(n, n_out, replace=False)
    ref[out_idx] = rng.uniform(-20, 20, (n_out, 3)).astype(np.float32)
    return src, ref, t


def test_ransac_beats_svd_under_outliers(rng):
    """With 60% outliers a plain weighted SVD fit is far off; RANSAC
    recovers the pose — the estimator-swap case the reference covers with
    open3d RANSAC."""
    src, ref, t = _corrupted_correspondences(rng)
    valid = jnp.ones(len(src), bool)

    svd_est = np.asarray(weighted_procrustes(jnp.asarray(src), jnp.asarray(ref)))
    est = np.asarray(
        correspondence_ransac(
            jnp.asarray(src), jnp.asarray(ref), valid, jax.random.PRNGKey(0),
            distance_threshold=0.3, num_iterations=2000,
        )
    )

    def rre_rte(a, b):
        tr = np.clip((np.trace(a[:3, :3].T @ b[:3, :3]) - 1) / 2, -1, 1)
        return np.degrees(np.arccos(tr)), np.linalg.norm(a[:3, 3] - b[:3, 3])

    rre_svd, rte_svd = rre_rte(t, svd_est)
    rre_rans, rte_rans = rre_rte(t, est)
    assert rre_rans < 0.5 and rte_rans < 0.05
    assert rre_svd > rre_rans and rte_svd > rte_rans


def test_ransac_all_invalid_stays_finite(rng):
    """A dump from a legitimately failed pair can have zero valid
    correspondences; the estimator must fall back to uniform sampling and
    return a finite transform instead of NaNs from a zero probability
    vector."""
    src = rng.uniform(-20, 20, (64, 3)).astype(np.float32)
    ref = rng.uniform(-20, 20, (64, 3)).astype(np.float32)
    valid = jnp.zeros(64, bool)
    est = np.asarray(
        correspondence_ransac(
            jnp.asarray(src), jnp.asarray(ref), valid, jax.random.PRNGKey(2),
            distance_threshold=0.3, num_iterations=64,
        )
    )
    assert np.isfinite(est).all()


def test_ransac_respects_validity_mask(rng):
    """Padded (invalid) correspondences are pure garbage; masking must keep
    them out of both sampling and inlier counting."""
    src, ref, t = _corrupted_correspondences(rng, n=128, outlier_frac=0.2)
    pad = 64
    src_p = np.concatenate([src, rng.uniform(-50, 50, (pad, 3)).astype(np.float32)])
    ref_p = np.concatenate([ref, rng.uniform(-50, 50, (pad, 3)).astype(np.float32)])
    valid = jnp.asarray(np.concatenate([np.ones(len(src), bool), np.zeros(pad, bool)]))
    est = np.asarray(
        correspondence_ransac(
            jnp.asarray(src_p), jnp.asarray(ref_p), valid, jax.random.PRNGKey(1),
            distance_threshold=0.3, num_iterations=2000,
        )
    )
    tr = np.clip((np.trace(t[:3, :3].T @ est[:3, :3]) - 1) / 2, -1, 1)
    assert np.degrees(np.arccos(tr)) < 0.5
    assert np.linalg.norm(t[:3, 3] - est[:3, 3]) < 0.05

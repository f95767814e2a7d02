"""GNC-TLS estimator tests (reference estimator: teaserpp via
`experiments/registration/eval.py:197-218`, noise_bound 0.3, gnc_factor 1.4,
100 iterations)."""

import numpy as np
import jax.numpy as jnp

from lcrnet_tpu.ops.gnc import gnc_tls_registration
from lcrnet_tpu.ops.procrustes import weighted_procrustes

from test_ransac import _corrupted_correspondences


def _rre_rte(a, b):
    tr = np.clip((np.trace(a[:3, :3].T @ b[:3, :3]) - 1) / 2, -1, 1)
    return np.degrees(np.arccos(tr)), np.linalg.norm(a[:3, 3] - b[:3, 3])


def test_gnc_beats_svd_under_outliers(rng):
    """With 60% outliers a plain weighted SVD fit is far off; GNC-TLS
    recovers the pose — the estimator-swap case the reference covers with
    the optional teaser method."""
    src, ref, t = _corrupted_correspondences(rng)
    valid = jnp.ones(len(src), bool)

    svd_est = np.asarray(weighted_procrustes(jnp.asarray(src), jnp.asarray(ref)))
    est = np.asarray(
        gnc_tls_registration(jnp.asarray(src), jnp.asarray(ref), valid)
    )
    rre_svd, rte_svd = _rre_rte(t, svd_est)
    rre_gnc, rte_gnc = _rre_rte(t, est)
    assert rre_gnc < 0.5 and rte_gnc < 0.05
    assert rre_svd > rre_gnc and rte_svd > rte_gnc


def test_gnc_respects_validity_mask(rng):
    """Padded correspondences must not influence the fit (they enter with
    weight 0 at every GNC round)."""
    src, ref, t = _corrupted_correspondences(rng, n=128, outlier_frac=0.2)
    pad = 64
    src_p = np.concatenate([src, rng.uniform(-50, 50, (pad, 3)).astype(np.float32)])
    ref_p = np.concatenate([ref, rng.uniform(-50, 50, (pad, 3)).astype(np.float32)])
    valid = jnp.asarray(np.concatenate([np.ones(len(src), bool), np.zeros(pad, bool)]))
    est = np.asarray(gnc_tls_registration(jnp.asarray(src_p), jnp.asarray(ref_p), valid))
    rre, rte = _rre_rte(t, est)
    assert rre < 0.5 and rte < 0.05


def test_gnc_clean_correspondences_match_svd(rng):
    """With zero outliers GNC's fixed point is the least-squares fit: all
    residuals sit far inside the truncation radius, so every weight
    saturates at 1 and the final Procrustes equals the plain one."""
    src, ref, t = _corrupted_correspondences(rng, n=128, outlier_frac=0.0, noise=0.01)
    valid = jnp.ones(len(src), bool)
    est = np.asarray(gnc_tls_registration(jnp.asarray(src), jnp.asarray(ref), valid))
    svd_est = np.asarray(weighted_procrustes(jnp.asarray(src), jnp.asarray(ref)))
    np.testing.assert_allclose(est, svd_est, atol=1e-4)

"""Direct tests for fine matching + LGR (reference
`local_global_registration.py:11-246`), including the per-row/column top-k
candidate extraction (self.k) that the shipped config sets to 1."""

import numpy as np
import jax.numpy as jnp
import pytest

from lcrnet_tpu.models.matching import fine_matching_lgr

from oracles import random_se3


def _make_patches(rng, p=8, k=24, noise=0.0):
    """P node pairs whose patches are rigidly related by one GT transform;
    the OT score matrix favors the true i<->i pairing."""
    t = random_se3(rng).astype(np.float32)
    src = rng.uniform(-5, 5, (p, k, 3)).astype(np.float32)
    ref = src @ t[:3, :3].T + t[:3, 3]
    if noise:
        ref = ref + rng.normal(scale=noise, size=ref.shape).astype(np.float32)
    # log-score matrix: strong diagonal, weak dustbin
    scores = np.full((p, k + 1, k + 1), -4.0, np.float32)
    for i in range(k):
        scores[:, i, i] = 2.0
    scores[:, -1, :] = -1.0
    scores[:, :, -1] = -1.0
    masks = np.ones((p, k), bool)
    valid = np.ones((p,), bool)
    return (
        jnp.asarray(ref), jnp.asarray(src), jnp.asarray(masks), jnp.asarray(masks),
        jnp.asarray(scores), jnp.asarray(valid), t,
    )


@pytest.mark.parametrize("topk", [1, 2])
def test_lgr_recovers_transform(rng, topk):
    ref, src, rm, sm, scores, valid, t = _make_patches(rng)
    out = fine_matching_lgr(
        ref, src, rm, sm, scores, valid,
        acceptance_radius=0.45, corr_limit=256, topk=topk,
    )
    est = np.asarray(out.estimated_transform)
    np.testing.assert_allclose(est, t, atol=1e-3)


def test_lgr_topk2_superset_of_topk1(rng):
    """k=2 keeps every k=1 candidate (top-1 is always inside top-2) and can
    only add more valid correspondences."""
    ref, src, rm, sm, scores, valid, _ = _make_patches(rng, noise=0.05)
    out1 = fine_matching_lgr(ref, src, rm, sm, scores, valid,
                             acceptance_radius=0.45, corr_limit=256, topk=1)
    out2 = fine_matching_lgr(ref, src, rm, sm, scores, valid,
                             acceptance_radius=0.45, corr_limit=256, topk=2)
    n1 = int(np.asarray(out1.corr_valid).sum())
    n2 = int(np.asarray(out2.corr_valid).sum())
    assert n2 >= n1
    pairs1 = {
        (tuple(np.round(r, 4)), tuple(np.round(s, 4)))
        for r, s, v in zip(np.asarray(out1.ref_corr_points),
                           np.asarray(out1.src_corr_points),
                           np.asarray(out1.corr_valid)) if v
    }
    pairs2 = {
        (tuple(np.round(r, 4)), tuple(np.round(s, 4)))
        for r, s, v in zip(np.asarray(out2.ref_corr_points),
                           np.asarray(out2.src_corr_points),
                           np.asarray(out2.corr_valid)) if v
    }
    assert pairs1 <= pairs2


def test_lgr_mutual_mode(rng):
    """mutual=True keeps only pairs selected from both sides (reference
    `local_global_registration.py:83-86` logical_and merge)."""
    ref, src, rm, sm, scores, valid, t = _make_patches(rng)
    out = fine_matching_lgr(
        ref, src, rm, sm, scores, valid,
        acceptance_radius=0.45, corr_limit=256, topk=1, mutual=True,
    )
    est = np.asarray(out.estimated_transform)
    np.testing.assert_allclose(est, t, atol=1e-3)
    # diagonal scores: exactly one mutual candidate per (patch, row)
    assert int(np.asarray(out.corr_valid).sum()) == ref.shape[0] * ref.shape[1]

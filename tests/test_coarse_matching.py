"""Coarse matching semantics tests, incl. the documented fixed-count
deviation: the reference sweeps a threshold downward in 0.01 steps and keeps
ALL scores above it (>= k entries, `superpoint_matching.py:163-186`), while
the TPU build keeps exactly the top k — a prefix of the reference set under
the same score ordering.  This pins that relation on a case where they
differ."""

import numpy as np
import jax.numpy as jnp

from lcrnet_tpu.models.matching import coarse_matching_ot


def reference_fixed_count_oracle(matching_scores, k):
    """The reference's threshold sweep (exp scores, 0.5 - 0.01*i)."""
    scores = np.exp(matching_scores)[:-1, :-1]
    thres = 0.5
    while True:
        mask = scores > thres
        if mask.sum() >= k:
            break
        thres -= 0.01
    idx = np.argwhere(mask)
    return {(int(i), int(j)) for i, j in idx}, scores


def test_fixed_count_topk_is_prefix_of_reference_sweep(rng):
    m = n = 24
    k = 10
    logits = rng.normal(scale=0.6, size=(m + 1, n + 1)).astype(np.float32)
    ref_set, scores = reference_fixed_count_oracle(logits, k)
    # make sure this case actually differs (sweep kept more than k)
    assert len(ref_set) > k

    res = coarse_matching_ot(
        jnp.asarray(logits),
        jnp.ones(m, bool), jnp.ones(n, bool),
        capacity=k, num_correspondences=k,
    )
    got = {
        (int(a), int(b))
        for a, b, v in zip(np.asarray(res.ref_indices), np.asarray(res.src_indices),
                           np.asarray(res.valid)) if v
    }
    assert len(got) == k
    # prefix relation: our top-k is inside the reference's kept set, and
    # every kept pair of ours outscores every reference pair we dropped
    assert got <= ref_set
    dropped = ref_set - got
    min_kept = min(scores[i, j] for i, j in got)
    max_dropped = max(scores[i, j] for i, j in dropped)
    assert min_kept >= max_dropped - 1e-6


def test_dustbin_capacity_covers_worst_case(rng):
    """With capacity = M + N the dustbin-mode union extraction cannot
    truncate: construct a worst case where every row and every column beats
    the dustbin at distinct positions (2*M - overlap entries)."""
    m = n = 16
    logits = np.full((m + 1, n + 1), -3.0, np.float32)
    # row argmaxes on the diagonal; column argmaxes in the last row (which
    # still keeps its own diagonal as the row max) -> 2m - 1 distinct wins,
    # the densest union the row/col-argmax construction admits
    for i in range(m):
        logits[i, i] = 2.0 + 0.01 * i
    for j in range(m - 1):
        logits[m - 1, j] = 2.0 + 0.01 * j + 0.005
    logits[-1, :] = 0.0
    logits[:, -1] = 0.0
    res = coarse_matching_ot(
        jnp.asarray(logits), jnp.ones(m, bool), jnp.ones(n, bool), capacity=m + n,
    )
    count = int(np.asarray(res.valid).sum())
    assert count == 2 * m - 1  # no truncation at capacity M+N

"""Coarse matching semantics tests.

Fixed-count mode has both reference semantics (the default): a threshold
swept downward in 0.01 steps keeping ALL scores above it (>= k entries,
`superpoint_matching.py:163-186`, implemented in closed form), and the
top-k variant (`threshold_sweep=False`) which keeps exactly k — a prefix of
the reference set under the same score ordering.  Both relations are pinned
against a direct numpy port of the reference's sweep loop."""

import numpy as np
import jax.numpy as jnp

from lcrnet_tpu.models.matching import coarse_matching_ot


def reference_fixed_count_oracle(matching_scores, k, node_scores=None):
    """The reference's threshold sweep (exp scores, 0.5 - 0.01*i),
    `superpoint_matching.py:162-186` ported verbatim to numpy."""
    scores = np.exp(matching_scores)[:-1, :-1].copy()
    if node_scores is not None:
        scores *= node_scores[0][:, None] * node_scores[1][None, :]
    m, n = scores.shape
    if m < k or n < k:
        k = min(m, n)
    thres = 0.5
    while True:
        mask = scores > thres
        if mask.sum() >= k:
            break
        thres -= 0.01
    idx = np.argwhere(mask)
    return {(int(i), int(j)) for i, j in idx}, scores


def _got_set(res):
    return {
        (int(a), int(b))
        for a, b, v in zip(np.asarray(res.ref_indices), np.asarray(res.src_indices),
                           np.asarray(res.valid)) if v
    }


def test_fixed_count_sweep_matches_reference_exactly(rng):
    """Default fixed-count mode = the reference's sweep set, exactly."""
    for trial in range(8):
        m = n = 24
        k = 10
        logits = rng.normal(scale=0.6, size=(m + 1, n + 1)).astype(np.float32)
        ref_set, _ = reference_fixed_count_oracle(logits, k)
        res = coarse_matching_ot(
            jnp.asarray(logits), jnp.ones(m, bool), jnp.ones(n, bool),
            capacity=m * n, num_correspondences=k,
        )
        assert _got_set(res) == ref_set, f"trial {trial}"


def test_fixed_count_sweep_with_node_scores_and_masks(rng):
    """Sweep mode with the n2p node-score multiply
    (`superpoint_matching.py:166-172`) and padded (masked) nodes: the oracle
    runs on the valid submatrix."""
    m_valid, n_valid, pad = 18, 20, 6
    k = 12
    logits = rng.normal(scale=0.6, size=(m_valid + 1, n_valid + 1)).astype(np.float32)
    rs = rng.uniform(0.2, 1.0, size=m_valid).astype(np.float32)
    ss = rng.uniform(0.2, 1.0, size=n_valid).astype(np.float32)
    ref_set, _ = reference_fixed_count_oracle(logits, k, node_scores=(rs, ss))

    # embed into padded budgets (padding after the valid block)
    big = np.full((m_valid + pad + 1, n_valid + pad + 1), 5.0, np.float32)
    big[:m_valid, :n_valid] = logits[:-1, :-1]
    big[-1, :n_valid] = logits[-1, :-1]
    big[:m_valid, -1] = logits[:-1, -1]
    rmask = np.arange(m_valid + pad) < m_valid
    smask = np.arange(n_valid + pad) < n_valid
    res = coarse_matching_ot(
        jnp.asarray(big), jnp.asarray(rmask), jnp.asarray(smask),
        capacity=(m_valid + pad) * (n_valid + pad), num_correspondences=k,
        ref_node_scores=jnp.asarray(np.concatenate([rs, np.ones(pad, np.float32)])),
        src_node_scores=jnp.asarray(np.concatenate([ss, np.ones(pad, np.float32)])),
    )
    assert _got_set(res) == ref_set


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
        capacity=k, num_correspondences=k, threshold_sweep=False,
    )
    got = _got_set(res)
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

"""Fused (Pallas, interpret on CPU) vs scan Sinkhorn equivalence."""

import numpy as np
import jax.numpy as jnp

from lcrnet_tpu.ops.sinkhorn import log_optimal_transport


def test_fused_matches_scan(rng):
    b, m, n = 5, 12, 9
    scores = rng.normal(size=(b, m, n)).astype(np.float32)
    row_masks = rng.uniform(size=(b, m)) > 0.2
    col_masks = rng.uniform(size=(b, n)) > 0.2
    row_masks[:, 0] = True
    col_masks[:, 0] = True
    args = (jnp.asarray(scores), jnp.asarray(1.0), jnp.asarray(row_masks), jnp.asarray(col_masks), 25)
    want = np.asarray(log_optimal_transport(*args, fused=False))
    got = np.asarray(log_optimal_transport(*args, fused=True))
    valid = np.concatenate([row_masks, np.ones((b, 1), bool)], 1)[:, :, None] & \
        np.concatenate([col_masks, np.ones((b, 1), bool)], 1)[:, None, :]
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-4, atol=1e-4)


def test_fused_all_invalid_batch_finite(rng):
    b, m, n = 3, 8, 8
    scores = rng.normal(size=(b, m, n)).astype(np.float32)
    row_masks = np.ones((b, m), bool)
    col_masks = np.ones((b, n), bool)
    row_masks[1] = False  # fully invalid patch slot
    col_masks[1] = False
    out = np.asarray(
        log_optimal_transport(
            jnp.asarray(scores), jnp.asarray(0.5), jnp.asarray(row_masks), jnp.asarray(col_masks), 10, fused=True
        )
    )
    valid = np.zeros_like(out, bool)
    valid[0] = valid[2] = True
    assert np.isfinite(out[valid]).all()


def test_fused_batch_valid_skip(rng):
    """batch_valid semantics: valid batches produce outputs identical to the
    no-flag run; invalid batches return -inf; whole patch blocks of invalid
    batches skip their iteration loops (the dynamic-sparsity path the patch
    OT uses — node_corr_valid is a sorted prefix, so the tail blocks skip)."""
    b, m, n = 20, 12, 9  # > patch_block=8 so at least one whole block skips
    scores = rng.normal(size=(b, m, n)).astype(np.float32)
    row_masks = np.ones((b, m), bool)
    col_masks = np.ones((b, n), bool)
    batch_valid = np.arange(b) < 6  # prefix, as coarse_matching_ot emits

    args = (jnp.asarray(scores), jnp.asarray(1.0), jnp.asarray(row_masks),
            jnp.asarray(col_masks), 25)
    base = np.asarray(log_optimal_transport(*args, fused=True))
    got = np.asarray(log_optimal_transport(
        *args, fused=True, batch_valid=jnp.asarray(batch_valid)))

    # skip granularity is the 8-patch block: batches 0-7 share a block with
    # valid entries and compute normally; blocks 1 and 2 (batches 8+) are
    # fully invalid and return -inf without running their iteration loops
    np.testing.assert_array_equal(got[:8], base[:8])
    assert (got[8:] <= -1.0e11).all()

    # the scan path ignores the flag entirely
    want = np.asarray(log_optimal_transport(*args, fused=False))
    got_scan = np.asarray(log_optimal_transport(
        *args, fused=False, batch_valid=jnp.asarray(batch_valid)))
    np.testing.assert_array_equal(got_scan, want)

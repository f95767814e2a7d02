"""Pallas banded radius search (interpret mode) vs the XLA banded path."""

import numpy as np
import jax.numpy as jnp

from lcrnet_tpu.ops.radius_search import radius_search_banded_batched
from lcrnet_tpu.ops.radius_search_pallas import radius_search_banded_pallas


def test_pallas_banded_matches_xla(rng):
    n, cap = 900, 1024
    pts = np.full((2, cap, 3), 1.0e6, np.float32)
    msk = np.zeros((2, cap), bool)
    for i in range(2):
        side = 30
        xy = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)[:n]
        pts[i, :n, :2] = xy * 0.35 + rng.uniform(-0.1, 0.1, (n, 2))
        pts[i, :n, 2] = rng.uniform(-0.5, 0.5, n)
        msk[i, :n] = True
    p, m = jnp.asarray(pts), jnp.asarray(msk)
    bi, bv = radius_search_banded_batched(p, p, m, m, 1.275, 20, block_size=256, window=768)
    ci, cv = radius_search_banded_pallas(
        p, p, m, m, 1.275, 20, block_size=256, window=768, interpret=True
    )
    bi, bv, ci, cv = map(np.asarray, (bi, bv, ci, cv))
    for b in range(2):
        for i in range(0, n, 13):
            assert set(bi[b, i][bv[b, i]].tolist()) == set(ci[b, i][cv[b, i]].tolist()), (b, i)
            # nearest-first order
            d = np.linalg.norm(pts[b][ci[b, i][cv[b, i]]] - pts[b, i], axis=1)
            assert np.all(np.diff(d) >= -1e-5)


def test_fast_select_same_sets_up_to_ties(rng):
    """bf16 extraction (fast_select) must pick the same nearest-neighbor
    SETS as the f32 path except where two candidates' d2 are within bf16
    resolution of each other (an equally valid truncation)."""
    import jax.numpy as jnp

    from lcrnet_tpu.ops.radius_search_pallas import radius_search_banded_pallas

    n = 4096
    pts = rng.uniform(-30, 30, (1, n, 3)).astype(np.float32)
    mask = np.ones((1, n), bool)
    radius, limit = 2.0, 16
    i32, v32 = radius_search_banded_pallas(
        jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(mask),
        radius, limit, interpret=True, fast_select=False,
    )
    i16, v16 = radius_search_banded_pallas(
        jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(mask),
        radius, limit, interpret=True, fast_select=True,
    )
    i32, v32, i16, v16 = map(np.asarray, (i32, v32, i16, v16))
    p = pts[0]
    mismatch_rows = 0
    for q in range(0, n, 37):
        s32 = set(i32[0, q][v32[0, q]].tolist())
        s16 = set(i16[0, q][v16[0, q]].tolist())
        if s32 == s16:
            continue
        mismatch_rows += 1
        # every set difference must be a near-tie at the selection boundary
        d2 = np.sum((p - p[q]) ** 2, axis=1)
        only32 = s32 - s16
        only16 = s16 - s32
        assert len(only32) == len(only16)
        for a in only32 | only16:
            boundary = max(d2[list(s32)]) if s32 else 0.0
            assert abs(d2[a] - boundary) < 0.01 * radius**2 + 1e-5, (q, a, d2[a], boundary)
    # ties must be rare
    assert mismatch_rows <= 12


def test_pallas_presorted_matches_default(rng):
    """presorted=True skips sorts/remaps; on canonically ordered inputs the
    tables must be bit-identical to the default path."""
    n, cap = 900, 1024
    pts = np.full((2, cap, 3), 1.0e6, np.float32)
    msk = np.zeros((2, cap), bool)
    for i in range(2):
        side = 30
        xy = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)[:n]
        pts[i, :n, :2] = xy * 0.35 + rng.uniform(-0.1, 0.1, (n, 2))
        pts[i, :n, 2] = rng.uniform(-0.5, 0.5, n)
        msk[i, :n] = True
    key = np.where(msk, pts[..., 0], 1.0e9)
    order = np.argsort(key, axis=-1)
    ps = np.take_along_axis(pts, order[..., None], axis=1)
    ms = np.take_along_axis(msk, order, axis=-1)
    p, m = jnp.asarray(ps), jnp.asarray(ms)
    bi, bv = radius_search_banded_pallas(
        p, p, m, m, 1.275, 20, block_size=256, window=768, interpret=True
    )
    ci, cv = radius_search_banded_pallas(
        p, p, m, m, 1.275, 20, block_size=256, window=768, interpret=True, presorted=True
    )
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(ci))
    np.testing.assert_array_equal(np.asarray(bv), np.asarray(cv))

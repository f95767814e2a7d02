"""Banded (x-sorted window) radius search vs the dense path."""

import numpy as np
import jax.numpy as jnp

from lcrnet_tpu.ops.radius_search import radius_search_banded_batched, radius_search_batched


def lidar_like(rng, b=2, n=900, cap=1024, extent=25.0):
    pts = np.full((b, cap, 3), 1.0e6, np.float32)
    msk = np.zeros((b, cap), bool)
    for i in range(b):
        # ground plane + a dense vertical wall (stresses the x-band)
        ground = rng.uniform(-extent, extent, (n - 200, 3)).astype(np.float32)
        ground[:, 2] = rng.uniform(-0.2, 0.2, n - 200)
        wall = np.zeros((200, 3), np.float32)
        wall[:, 0] = 3.0 + rng.uniform(-0.05, 0.05, 200)
        wall[:, 1] = rng.uniform(-10, 10, 200)
        wall[:, 2] = rng.uniform(0, 5, 200)
        cloud = np.concatenate([ground, wall])
        rng.shuffle(cloud)
        pts[i, :n] = cloud
        msk[i, :n] = True
    return jnp.asarray(pts), jnp.asarray(msk)


def test_banded_matches_dense_self(rng):
    pts, msk = lidar_like(rng)
    radius, limit = 1.275, 20
    di, dv = radius_search_batched(pts, pts, msk, msk, radius, limit, block_size=256)
    bi, bv = radius_search_banded_batched(
        pts, pts, msk, msk, radius, limit, block_size=256, window=768
    )
    di, dv, bi, bv = map(np.asarray, (di, dv, bi, bv))
    p = np.asarray(pts)
    for b in range(2):
        for i in range(0, 900, 11):
            want = set(di[b, i][dv[b, i]].tolist())
            got = set(bi[b, i][bv[b, i]].tolist())
            assert want == got, (b, i)
            d = np.linalg.norm(p[b][bi[b, i][bv[b, i]]] - p[b, i], axis=1)
            assert np.all(np.diff(d) >= -1e-5)


def test_banded_cross_sets(rng):
    pts, msk = lidar_like(rng, n=700)
    q = pts[:, :400] + jnp.asarray([0.3, -0.2, 0.05])
    qm = msk[:, :400]
    radius, limit = 2.0, 16
    di, dv = radius_search_batched(q, pts, qm, msk, radius, limit, block_size=128)
    bi, bv = radius_search_banded_batched(q, pts, qm, msk, radius, limit, block_size=128, window=768)
    di, dv, bi, bv = map(np.asarray, (di, dv, bi, bv))
    for b in range(2):
        for i in range(0, 400, 7):
            assert set(di[b, i][dv[b, i]].tolist()) == set(bi[b, i][bv[b, i]].tolist()), (b, i)


def test_packed_select_nearest_matches_exact(rng):
    """The packed single-min extraction (fast_select dense path) picks the
    same neighbor sets as the exact path up to quantization ties."""
    import jax.numpy as jnp

    from lcrnet_tpu.ops.radius_search import radius_search_batched

    pts = rng.uniform(-20, 20, (2, 1024, 3)).astype(np.float32)
    mask = np.ones((2, 1024), bool)
    radius, limit = 2.5, 20
    i_exact, v_exact = radius_search_batched(
        jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(mask),
        radius, limit)
    i_fast, v_fast = radius_search_batched(
        jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(mask),
        radius, limit, fast_select=True)
    i_exact, v_exact, i_fast, v_fast = map(np.asarray, (i_exact, v_exact, i_fast, v_fast))
    mism = 0
    for b in range(2):
        for q in range(0, 1024, 17):
            se = set(i_exact[b, q][v_exact[b, q]].tolist())
            sf = set(i_fast[b, q][v_fast[b, q]].tolist())
            if se == sf:
                continue
            mism += 1
            d2 = np.sum((pts[b] - pts[b, q]) ** 2, axis=1)
            boundary = max(d2[list(se)]) if se else 0.0
            for a in se ^ sf:
                assert abs(d2[a] - boundary) < radius**2 / 1024, (b, q, a)
    assert mism <= 6


def test_banded_presorted_matches_default(rng):
    """presorted=True (canonical pyramid-stage order) must reproduce the
    default path's neighbor sets exactly, with indices in the sorted frame."""
    pts, msk = lidar_like(rng)
    # canonical order: x-ascending, pads at the tail
    key = np.where(np.asarray(msk), np.asarray(pts)[..., 0], 1.0e9)
    order = np.argsort(key, axis=-1)
    ps = np.take_along_axis(np.asarray(pts), order[..., None], axis=1)
    ms = np.take_along_axis(np.asarray(msk), order, axis=-1)
    ps_j, ms_j = jnp.asarray(ps), jnp.asarray(ms)
    radius, limit = 1.275, 20
    di, dv = radius_search_banded_batched(
        ps_j, ps_j, ms_j, ms_j, radius, limit, block_size=256, window=768
    )
    pi, pv = radius_search_banded_batched(
        ps_j, ps_j, ms_j, ms_j, radius, limit, block_size=256, window=768, presorted=True
    )
    np.testing.assert_array_equal(np.asarray(di), np.asarray(pi))
    np.testing.assert_array_equal(np.asarray(dv), np.asarray(pv))


def test_banded_default_block_respects_window_contract(rng):
    """Regression: the per-stage windows are calibrated for ~128-row query
    blocks (the Pallas kernel's).  With the old 2048-row default block the
    window could not cover a block's x-span + 2r band at production-like
    shapes — 20% of stage-1 rows came back EMPTY on the real demo scans
    (caught by experiments/full_parity.py vs the reference's C++ tables).
    Run the production call shape (default block_size, presorted, window
    smaller than the cloud) and demand set-equality with the dense sweep."""
    n = 6144
    pts = np.zeros((1, n, 3), np.float32)
    pts[0, :, 0] = np.sort(rng.uniform(-60, 60, n)).astype(np.float32)  # presorted by x
    pts[0, :, 1] = rng.uniform(-20, 20, n)
    pts[0, :, 2] = rng.uniform(-1, 1, n)
    msk = np.ones((1, n), bool)
    pts, msk = jnp.asarray(pts), jnp.asarray(msk)
    radius, limit = 2.55, 24
    di, dv = radius_search_batched(pts, pts, msk, msk, radius, limit)
    bi, bv = radius_search_banded_batched(
        pts, pts, msk, msk, radius, limit, window=1024, presorted=True
    )
    di, dv, bi, bv = map(np.asarray, (di, dv, bi, bv))
    empty_with_true = np.logical_and(~bv.any(-1), dv.any(-1)).mean()
    assert empty_with_true == 0.0
    for i in range(0, n, 37):
        want = set(di[0, i][dv[0, i]].tolist())
        got = set(bi[0, i][bv[0, i]].tolist())
        assert want == got, i

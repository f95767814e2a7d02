"""Tests for the on-device pyramid builder."""

import numpy as np
import jax
import jax.numpy as jnp

from lcrnet_tpu.ops.pyramid import build_pyramid
from oracles import grid_subsample_oracle


def make_cloud(rng, n=600, spacing=0.4):
    """Dense jittered surface patch (LiDAR-like): ~spacing-separated points,
    so doubling voxel sizes actually merge points at every stage."""
    side = int(np.ceil(np.sqrt(n)))
    xy = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)[:n]
    pts = np.zeros((n, 3), np.float32)
    pts[:, :2] = xy * spacing + rng.uniform(-0.1, 0.1, size=(n, 2))
    pts[:, 2] = np.sin(pts[:, 0]) * 0.5 + rng.uniform(-0.05, 0.05, size=n)
    return pts.astype(np.float32)


def pad(points, cap):
    out = np.full((cap, 3), 1.0e6, np.float32)
    out[: len(points)] = points
    mask = np.zeros(cap, bool)
    mask[: len(points)] = True
    return jnp.asarray(out), jnp.asarray(mask)



def jbuild(p, m, caps, limits, voxel=0.3, radius=1.275):
    """Jitted build_pyramid (eager dispatch costs tens of seconds on CPU;
    the jitted program lands in the session persistent cache)."""
    return jax.jit(
        lambda p, m: build_pyramid(p, m, caps, limits, voxel, radius)
    )(p, m)

def test_pyramid_shapes_and_stages(rng):
    pts = make_cloud(rng)
    p, m = pad(pts, 768)
    caps = (768, 384, 192, 96)
    limits = (16, 16, 16, 16)
    pyr = jax.jit(
        lambda p, m: build_pyramid(p, m, caps, limits, 0.3, 1.275)
    )(p, m)
    assert len(pyr.points) == 4
    for s, cap in enumerate(caps):
        assert pyr.points[s].shape == (cap, 3)
        assert pyr.masks[s].shape == (cap,)
        assert pyr.neighbors[s].shape == (cap, limits[s])
    assert len(pyr.subsampling) == 3
    assert len(pyr.upsampling) == 3
    # stage counts shrink monotonically
    counts = [int(np.asarray(msk).sum()) for msk in pyr.masks]
    assert counts[0] == 600
    assert counts[0] > counts[1] > counts[2] > counts[3] > 0


def test_pyramid_stage1_matches_oracle(rng):
    pts = make_cloud(rng, n=400)
    p, m = pad(pts, 512)
    pyr = jbuild(p, m, (512, 256, 128, 64), (8, 8, 8, 8))
    want = grid_subsample_oracle(pts.astype(np.float64), 0.6)
    got = np.asarray(pyr.points[1])[np.asarray(pyr.masks[1])]
    assert len(got) == len(want)
    got_s = got[np.lexsort(got.T)]
    want_s = want[np.lexsort(want.T)]
    np.testing.assert_allclose(got_s, want_s, atol=1e-3)


def test_pyramid_neighbor_tables_are_self_consistent(rng):
    pts = make_cloud(rng, n=300)
    p, m = pad(pts, 384)
    pyr = jbuild(p, m, (384, 192, 96, 48), (12, 12, 12, 12))
    # every valid neighbor of stage 0 is within init_radius
    idx = np.asarray(pyr.neighbors[0])
    val = np.asarray(pyr.neighbor_masks[0])
    p0 = np.asarray(pyr.points[0])
    for i in range(0, 300, 37):
        for j in range(idx.shape[1]):
            if val[i, j]:
                d = np.linalg.norm(p0[i] - p0[idx[i, j]])
                assert d <= 1.275 + 1e-5
    # subsampling table: stage-1 queries over stage-0 supports
    sub_idx = np.asarray(pyr.subsampling[0])
    sub_val = np.asarray(pyr.subsampling_masks[0])
    p1 = np.asarray(pyr.points[1])
    m1 = np.asarray(pyr.masks[1])
    assert sub_val[m1].any(axis=1).all()  # every valid coarse point has a parent


def test_pyramid_batched_over_pair(rng):
    from lcrnet_tpu.ops.pyramid import build_pyramid_batched

    pts_a = make_cloud(rng, n=250)
    pts_b = make_cloud(rng, n=280)
    pa, ma = pad(pts_a, 384)
    pb, mb = pad(pts_b, 384)
    stacked_p = jnp.stack([pa, pb])
    stacked_m = jnp.stack([ma, mb])
    pyr = jax.jit(lambda a, b: build_pyramid_batched(a, b, (384, 192, 96, 48), (8, 8, 8, 8), 0.3, 1.275))(stacked_p, stacked_m)
    assert pyr.points[0].shape == (2, 384, 3)
    counts = np.asarray(pyr.masks[0]).sum(axis=1)
    np.testing.assert_array_equal(counts, [250, 280])
    # batched tables agree with the single-cloud path
    single = jbuild(pa, ma, (384, 192, 96, 48), (8, 8, 8, 8))
    np.testing.assert_array_equal(np.asarray(pyr.neighbors[0][0]), np.asarray(single.neighbors[0]))
    np.testing.assert_array_equal(np.asarray(pyr.upsampling[0][0]), np.asarray(single.upsampling[0]))


def test_banded_nearest_upsample_matches_dense(rng):
    """The upsampling tables ride the banded search with limit=1 when the
    support stage is large (pyramid.py): verify against the dense
    nearest-in-radius argmin on x-sorted clouds at production-gate scale
    (supports >= 4096 — CPU tests at tiny shapes never hit this path)."""
    from lcrnet_tpu.ops.pyramid import _search
    from lcrnet_tpu.ops.radius_search import nearest_search_batched

    b, nq, ns, extent = 2, 8192, 4096, 60.0
    radius = 2.55

    def sorted_cloud(n, cap, key):
        pts = np.full((cap, 3), 1.0e6, np.float32)
        c = key.uniform(-extent, extent, (n, 3)).astype(np.float32)
        c[:, 2] = key.uniform(-1.5, 1.5, n)
        c = c[np.argsort(c[:, 0])]
        pts[:n] = c
        msk = np.zeros(cap, bool)
        msk[:n] = True
        return pts, msk

    qs, qms, ss, sms = [], [], [], []
    for i in range(b):
        qp, qm = sorted_cloud(nq - 100 * i, nq, rng)
        sp, sm = sorted_cloud(ns - 50 * i, ns, rng)
        qs.append(qp), qms.append(qm), ss.append(sp), sms.append(sm)
    q, qm = jnp.asarray(np.stack(qs)), jnp.asarray(np.stack(qms))
    s, sm = jnp.asarray(np.stack(ss)), jnp.asarray(np.stack(sms))

    bi, bv = _search(q, s, qm, sm, radius, 1, False, 2048)
    di, dv = nearest_search_batched(q, s, qm, sm, radius)
    bi, bv, di, dv = map(np.asarray, (bi, bv, di, dv))
    np.testing.assert_array_equal(bv[..., 0], dv)
    # same nearest support wherever one exists (random floats: no ties)
    np.testing.assert_array_equal(bi[..., 0][dv], di[dv])

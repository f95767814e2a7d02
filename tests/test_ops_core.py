"""Unit tests for the core ops library against numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcrnet_tpu.ops import (
    apply_transform,
    greedy_radius_nms,
    grid_subsample,
    inverse_transform,
    log_optimal_transport,
    pairwise_distance,
    point_to_node_partition,
    radius_search,
    weighted_procrustes,
)
from lcrnet_tpu.ops.nms import compact_by_mask
from lcrnet_tpu.ops.transform import (
    get_transform_from_rotation_translation,
    rodrigues_rotation_matrix,
)

from oracles import (
    greedy_nms_oracle,
    grid_subsample_oracle,
    point_to_node_oracle,
    procrustes_oracle,
    radius_neighbors_oracle,
    random_se3,
    sinkhorn_oracle,
)


def pad_cloud(points, capacity):
    n = len(points)
    out = np.full((capacity, 3), 1.0e6, np.float32)
    out[:n] = points
    mask = np.zeros(capacity, bool)
    mask[:n] = True
    return jnp.asarray(out), jnp.asarray(mask)


def test_pairwise_distance_matches_numpy(rng):
    x = rng.normal(size=(50, 3)).astype(np.float32)
    y = rng.normal(size=(40, 3)).astype(np.float32)
    got = np.asarray(pairwise_distance(jnp.asarray(x), jnp.asarray(y)))
    want = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, np.maximum(want, 1e-12), rtol=1e-4, atol=1e-5)


def test_apply_transform_roundtrip(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    t = random_se3(rng).astype(np.float32)
    moved = apply_transform(jnp.asarray(pts), jnp.asarray(t))
    back = apply_transform(moved, inverse_transform(jnp.asarray(t)))
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)


def test_apply_transform_batched(rng):
    pts = rng.normal(size=(4, 10, 3)).astype(np.float32)
    ts = np.stack([random_se3(rng) for _ in range(4)]).astype(np.float32)
    got = np.asarray(apply_transform(jnp.asarray(pts), jnp.asarray(ts)))
    for b in range(4):
        want = pts[b] @ ts[b][:3, :3].T + ts[b][:3, 3]
        np.testing.assert_allclose(got[b], want, atol=1e-4)


def test_rodrigues_yaw():
    r = rodrigues_rotation_matrix(jnp.array([0.0, 0.0, 1.0]), jnp.array(np.pi / 2))
    want = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    np.testing.assert_allclose(np.asarray(r), want, atol=1e-6)


def test_grid_subsample_matches_oracle(rng):
    points = rng.uniform(-10, 10, size=(300, 3)).astype(np.float32)
    vs = 1.5
    want = grid_subsample_oracle(points.astype(np.float64), vs)
    p, m = pad_cloud(points, 512)
    got_p, got_m = jax.jit(lambda p, m: grid_subsample(p, m, vs, 320))(p, m)
    got = np.asarray(got_p)[np.asarray(got_m)]
    assert len(got) == len(want)
    # match barycenters as sets (order differs: ours is voxel-id sorted)
    got_sorted = got[np.lexsort(got.T)]
    want_sorted = want[np.lexsort(want.T)]
    np.testing.assert_allclose(got_sorted, want_sorted, atol=1e-3)


def test_grid_subsample_respects_mask(rng):
    points = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
    p, m = pad_cloud(points[:60], 128)
    got_p, got_m = grid_subsample(p, m, 2.0, 64)
    want = grid_subsample_oracle(points[:60].astype(np.float64), 2.0)
    assert int(np.asarray(got_m).sum()) == len(want)


def test_radius_search_matches_oracle(rng):
    q = rng.uniform(-5, 5, size=(60, 3)).astype(np.float32)
    s = rng.uniform(-5, 5, size=(80, 3)).astype(np.float32)
    radius, limit = 2.0, 10
    want_idx, want_valid = radius_neighbors_oracle(q, s, radius, limit)
    qp, qm = pad_cloud(q, 64)
    sp, sm = pad_cloud(s, 96)
    got_idx, got_valid = jax.jit(
        lambda a, b, c, d: radius_search(a, b, c, d, radius, limit, block_size=32)
    )(qp, sp, qm, sm)
    got_idx = np.asarray(got_idx)[:60]
    got_valid = np.asarray(got_valid)[:60]
    np.testing.assert_array_equal(got_valid, want_valid)
    # same neighbor sets, nearest-first (ties may reorder; compare distances)
    for i in range(60):
        gi = got_idx[i][got_valid[i]]
        wi = want_idx[i][want_valid[i]]
        gd = np.linalg.norm(s[gi] - q[i], axis=1)
        wd = np.linalg.norm(s[wi] - q[i], axis=1)
        np.testing.assert_allclose(np.sort(gd), np.sort(wd), atol=1e-5)
        np.testing.assert_allclose(gd, np.sort(gd), atol=1e-5)  # sorted rows


def test_greedy_nms_matches_sequential(rng):
    nodes = rng.uniform(-10, 10, size=(150, 3)).astype(np.float32)
    want = greedy_nms_oracle(nodes, 2.4)
    p, m = pad_cloud(nodes, 192)
    got = np.asarray(jax.jit(lambda p, m: greedy_radius_nms(p, m, 2.4))(p, m))[:150]
    np.testing.assert_array_equal(got, want)


def test_greedy_nms_dense_chain(rng):
    # adversarial: a dense line of points where greedy order matters
    nodes = np.stack([np.linspace(0, 30, 100), np.zeros(100), np.zeros(100)], 1).astype(np.float32)
    perm = rng.permutation(100)
    nodes = nodes[perm]
    want = greedy_nms_oracle(nodes, 1.0)
    p, m = pad_cloud(nodes, 128)
    got = np.asarray(greedy_radius_nms(p, m, 1.0))[:100]
    np.testing.assert_array_equal(got, want)


def test_compact_by_mask(rng):
    vals = rng.normal(size=(20, 3)).astype(np.float32)
    keep = rng.uniform(size=20) > 0.5
    out, out_mask, src = compact_by_mask(jnp.asarray(vals), jnp.asarray(keep), 16)
    kept = vals[keep]
    count = min(len(kept), 16)
    assert int(np.asarray(out_mask).sum()) == count
    np.testing.assert_allclose(np.asarray(out)[:count], kept[:count], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(src)[:count], np.nonzero(keep)[0][:count])


def test_point_to_node_partition_matches_oracle(rng):
    points = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
    nodes = rng.uniform(-5, 5, size=(20, 3)).astype(np.float32)
    limit = 16
    want_p2n, want_occ, want_idx, want_mask = point_to_node_oracle(points, nodes, limit)
    pp, pm = pad_cloud(points, 256)
    np_, nm = pad_cloud(nodes, 32)
    p2n, occ, idx, msk = jax.jit(
        lambda a, b, c, d: point_to_node_partition(a, b, c, d, limit)
    )(pp, np_, pm, nm)
    np.testing.assert_array_equal(np.asarray(p2n)[:200], want_p2n)
    np.testing.assert_array_equal(np.asarray(occ)[:20], want_occ)
    np.testing.assert_array_equal(np.asarray(msk)[:20], want_mask)
    # same point sets per patch (ties may reorder equality-distance entries)
    for m in range(20):
        np.testing.assert_array_equal(
            np.sort(np.asarray(idx)[m][np.asarray(msk)[m]]),
            np.sort(want_idx[m][want_mask[m]]),
        )


def test_sinkhorn_matches_oracle(rng):
    b, m, n = 2, 12, 9
    scores = rng.normal(size=(b, m, n)).astype(np.float32)
    row_masks = rng.uniform(size=(b, m)) > 0.2
    col_masks = rng.uniform(size=(b, n)) > 0.2
    row_masks[:, 0] = True
    col_masks[:, 0] = True
    alpha = 1.0
    want = sinkhorn_oracle(scores.astype(np.float64), alpha, row_masks, col_masks, 30)
    got = np.asarray(
        jax.jit(
            lambda s, r, c: log_optimal_transport(s, jnp.asarray(alpha), r, c, 30)
        )(jnp.asarray(scores), jnp.asarray(row_masks), jnp.asarray(col_masks))
    )
    valid = np.concatenate([row_masks, np.ones((b, 1), bool)], 1)[:, :, None] & \
        np.concatenate([col_masks, np.ones((b, 1), bool)], 1)[:, None, :]
    np.testing.assert_allclose(got[valid], want[valid], rtol=1e-3, atol=1e-3)


def test_sinkhorn_rows_sum_to_marginals(rng):
    b, m, n = 1, 8, 8
    scores = rng.normal(size=(b, m, n)).astype(np.float32)
    masks = np.ones((b, m), bool)
    out = np.asarray(
        log_optimal_transport(jnp.asarray(scores), jnp.asarray(0.5), jnp.asarray(masks), jnp.asarray(masks), 200)
    )
    p = np.exp(out)
    # after convergence each non-dustbin row sums to ~1/(m+n) * (m+n) = 1
    np.testing.assert_allclose(p[0, :m, :].sum(1), np.ones(m), atol=1e-3)


def test_procrustes_exact_recovery(rng):
    src = rng.normal(size=(50, 3)).astype(np.float32)
    t = random_se3(rng).astype(np.float32)
    ref = src @ t[:3, :3].T + t[:3, 3]
    w = np.ones(50, np.float32)
    got = np.asarray(weighted_procrustes(jnp.asarray(src), jnp.asarray(ref), jnp.asarray(w)))
    np.testing.assert_allclose(got, t, atol=1e-4)


def test_procrustes_matches_oracle_weighted(rng):
    src = rng.normal(size=(30, 3)).astype(np.float32)
    ref = rng.normal(size=(30, 3)).astype(np.float32)
    w = rng.uniform(size=30).astype(np.float32)
    want = procrustes_oracle(src.astype(np.float64), ref.astype(np.float64), w.astype(np.float64))
    got = np.asarray(weighted_procrustes(jnp.asarray(src), jnp.asarray(ref), jnp.asarray(w)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_procrustes_batched(rng):
    src = rng.normal(size=(4, 20, 3)).astype(np.float32)
    ts = np.stack([random_se3(rng) for _ in range(4)]).astype(np.float32)
    ref = np.einsum("bnc,bdc->bnd", src, ts[:, :3, :3]) + ts[:, None, :3, 3]
    got = np.asarray(weighted_procrustes(jnp.asarray(src), jnp.asarray(ref)))
    np.testing.assert_allclose(got, ts, atol=1e-3)


def test_procrustes_zero_weights_no_nan():
    src = jnp.zeros((1, 10, 3))
    ref = jnp.zeros((1, 10, 3))
    w = jnp.zeros((1, 10))
    out = np.asarray(weighted_procrustes(src, ref, w))
    assert np.all(np.isfinite(out))


def test_kabsch_rotation_3x3_matches_lapack(rng):
    """The closed-form Jacobi Kabsch rotation (the TPU path in
    weighted_procrustes) must match the LAPACK-SVD det-corrected rotation on
    well-conditioned inputs, including reflection (det < 0) cases, and stay
    a valid rotation on degenerate ranks."""
    from lcrnet_tpu.ops.procrustes import kabsch_rotation_3x3

    def lapack_r(h):
        u, _, vt = np.linalg.svd(h)
        v, ut = vt.T, u.T
        d = np.sign(np.linalg.det(v @ ut))
        return v @ np.diag([1.0, 1.0, d]) @ ut

    h = rng.normal(size=(64, 3, 3)).astype(np.float32)
    got = np.asarray(kabsch_rotation_3x3(jnp.asarray(h)))
    for i in range(64):
        want = lapack_r(h[i].astype(np.float64))
        np.testing.assert_allclose(got[i], want, atol=2e-5)
        assert np.linalg.det(got[i]) > 0.99

    # degenerate: rank-2, rank-1 and zero H still yield proper rotations
    r1 = rng.normal(size=3)
    degen = np.stack([
        np.outer(rng.normal(size=3), r1) + np.outer(rng.normal(size=3), rng.normal(size=3)),
        np.outer(rng.normal(size=3), r1),
        np.zeros((3, 3)),
    ]).astype(np.float32)
    rs = np.asarray(kabsch_rotation_3x3(jnp.asarray(degen)))
    for r in rs:
        assert np.isfinite(r).all()
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
        assert np.linalg.det(r) > 0.99
    np.testing.assert_allclose(rs[2], np.eye(3), atol=1e-6)

    # rank-2 case: rotation must still solve the (planar) alignment exactly
    ref_pts = rng.normal(size=(200, 3)).astype(np.float32)
    ref_pts[:, 2] = 0.0  # planar
    ang = 0.7
    rot = np.array([[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    src_pts = ref_pts @ rot  # src = R^T ref, i.e. ref = R @ src
    hh = (src_pts.T @ ref_pts).astype(np.float32)
    r = np.asarray(kabsch_rotation_3x3(jnp.asarray(hh)))
    np.testing.assert_allclose(r, rot, atol=1e-4)

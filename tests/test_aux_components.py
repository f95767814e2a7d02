"""Tests for auxiliary components: ball query, grouping, knn interpolate,
calibration, visualization export."""

import numpy as np
import jax
import jax.numpy as jnp

from lcrnet_tpu.config import make_test_cfg
from lcrnet_tpu.models.kpconv import knn_interpolate, nearest_upsample
from lcrnet_tpu.ops.partition import ball_query_partition, random_grouping
from lcrnet_tpu.ops.radius_search import knn_search
from lcrnet_tpu.utils.visualization import correspondence_scene, shifted_node_scene, write_ply


def test_ball_query_partition(rng):
    points = rng.uniform(-5, 5, (200, 3)).astype(np.float32)
    nodes = rng.uniform(-5, 5, (16, 3)).astype(np.float32)
    pm = jnp.ones(200, bool)
    nm = jnp.ones(16, bool)
    idx, masks, sizes = ball_query_partition(
        jnp.asarray(points), jnp.asarray(nodes), pm, nm, radius=2.0, point_limit=24
    )
    idx, masks, sizes = map(np.asarray, (idx, masks, sizes))
    for m in range(16):
        d = np.linalg.norm(points - nodes[m], axis=1)
        want = min((d < 2.0).sum(), 24)
        assert sizes[m] == want
        sel = idx[m][masks[m]]
        assert np.all(np.linalg.norm(points[sel] - nodes[m], axis=1) < 2.0)


def test_random_grouping(rng):
    points = rng.normal(size=(50, 3)).astype(np.float32)
    mask = np.ones(50, bool)
    mask[30:] = False
    groups, valid = random_grouping(
        jnp.asarray(points), jnp.asarray(mask), num_groups=8, group_size=6, key=jax.random.PRNGKey(0)
    )
    groups, valid = np.asarray(groups), np.asarray(valid)
    assert groups.shape == (8, 6)
    assert np.all(groups[valid] < 30)  # only valid points sampled


def test_knn_interpolate_exact_on_nodes(rng):
    s_points = rng.uniform(-5, 5, (1, 64, 3)).astype(np.float32)
    s_feats = rng.normal(size=(1, 64, 8)).astype(np.float32)
    q_points = s_points  # querying exactly at supports -> features recovered
    sm = jnp.ones((1, 64), bool)
    d2, idx, valid = jax.vmap(lambda q, s, qm, smm: knn_search(q, s, qm, smm, 3))(
        jnp.asarray(q_points), jnp.asarray(s_points), sm, sm
    )
    out = knn_interpolate(jnp.asarray(s_feats), jnp.asarray(q_points), jnp.asarray(s_points), idx, valid)
    np.testing.assert_allclose(np.asarray(out), s_feats, atol=1e-3)


def test_write_ply_and_scenes(tmp_path, rng):
    ref = rng.normal(size=(30, 3)).astype(np.float32)
    src = rng.normal(size=(25, 3)).astype(np.float32)
    pts, cols, edges, ecols = correspondence_scene(
        ref, src, ref[:5], src[:5], corr_correct=np.array([1, 0, 1, 1, 0], bool)
    )
    path = str(tmp_path / "scene.ply")
    write_ply(path, pts, cols, edges)
    text = open(path).read()
    assert "element vertex" in text and "element edge 5" in text

    pts2, cols2, edges2 = shifted_node_scene(ref, src[:6], src[:6] + 0.5)
    assert len(edges2) == 6


def test_calibration_suggests_sane_limits(rng):
    from lcrnet_tpu.data.calibrate import calibrate_neighbor_limits

    cfg = make_test_cfg()

    def source(i):
        r = np.random.default_rng(i)
        side = 20
        xy = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)[:380]
        pts = np.zeros((380, 3), np.float32)
        pts[:, :2] = xy * 0.35 + r.uniform(-0.05, 0.05, (380, 2))
        return pts

    limits = calibrate_neighbor_limits(cfg, source, [0, 1], sample_threshold=100)
    assert len(limits) == 4
    assert all(1 <= l <= 500 for l in limits)
    # stage-0 limit should be around the in-radius count of a 0.35-spaced
    # grid at radius 1.275 (~ pi r^2 / 0.35^2 ~ 40)
    assert 10 <= limits[0] <= 80

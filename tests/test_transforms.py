"""Tests for the augmentation-primitive library
(`utils/transforms/functional.py` parity)."""

import numpy as np
import pytest

from lcrnet_tpu.data import transforms as T


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture
def cloud(rng):
    return rng.uniform(-10, 10, (500, 3))


def unit_normals(rng, n):
    v = rng.normal(size=(n, 3))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_normalize_points(cloud):
    out = T.normalize_points(cloud)
    assert np.allclose(out.mean(0), 0.0, atol=1e-9)
    assert np.isclose(np.linalg.norm(out, axis=1).max(), 1.0)


def test_sample_points_first_k(cloud):
    assert np.array_equal(T.sample_points(cloud, 100), cloud[:100])
    p, n = T.sample_points(cloud, 100, normals=cloud + 1)
    assert np.array_equal(n, cloud[:100] + 1)


def test_random_sample_points_truncate_and_wrap(cloud, rng):
    out = T.random_sample_points(cloud, 100, rng)
    assert out.shape == (100, 3)
    # every sampled row is a row of the input, all distinct
    assert len(np.unique(out, axis=0)) == 100
    # pad-by-wrap: 500 -> 1234 repeats the permutation
    big = T.random_sample_points(cloud, 1234, rng)
    assert big.shape == (1234, 3)
    assert np.array_equal(big[:500], big[500:1000])


def test_random_scale_shift_points(cloud, rng):
    normals = unit_normals(rng, len(cloud))
    out, n = T.random_scale_shift_points(cloud, rng, normals=normals)
    assert out.shape == cloud.shape
    assert np.allclose(np.linalg.norm(n, axis=1), 1.0)  # renormalized
    # the affine map is recoverable: per-axis lstsq of out vs cloud
    for ax in range(3):
        a = np.polyfit(cloud[:, ax], out[:, ax], 1)
        assert 2 / 3 - 1e-6 <= a[0] <= 3 / 2 + 1e-6
        assert -0.2 - 1e-6 <= a[1] <= 0.2 + 1e-6


def test_random_rotate_up_axis_preserves_z_and_norm(cloud, rng):
    out = T.random_rotate_points_along_up_axis(cloud, rng)
    assert np.allclose(out[:, 2], cloud[:, 2])
    assert np.allclose(np.linalg.norm(out[:, :2], axis=1),
                       np.linalg.norm(cloud[:, :2], axis=1))


def test_random_rescale_points(cloud, rng):
    out = T.random_rescale_points(cloud, rng)
    s = out[0, 0] / cloud[0, 0]
    assert 0.8 <= s <= 1.2
    assert np.allclose(out, cloud * s)


def test_random_jitter_points_bounded(cloud, rng):
    out = T.random_jitter_points(cloud, scale=0.5, rng=rng, noise_magnitude=0.05)
    assert np.abs(out - cloud).max() <= 0.05 + 1e-12


def test_random_shuffle_points_is_permutation(cloud, rng):
    out = T.random_shuffle_points(cloud, rng)
    assert np.array_equal(np.sort(out, axis=0), np.sort(cloud, axis=0))


def test_random_dropout_points(cloud, rng):
    out = T.random_dropout_points(cloud, max_p=0.95, rng=rng)
    assert out.shape == cloud.shape
    collapsed = np.all(out == cloud[0], axis=1)
    assert collapsed.sum() > 10  # some points collapsed onto points[0]
    assert not np.shares_memory(out, cloud)  # non-mutating


def test_random_jitter_features(rng):
    feats = np.zeros((100, 8), np.float32)
    out = T.random_jitter_features(feats, rng)
    assert out.shape == feats.shape


def test_plane_crop_keeps_halfspace(cloud, rng):
    normal = np.array([1.0, 0.0, 0.0])
    out = T.random_crop_point_cloud_with_plane(cloud, p_normal=normal, keep_ratio=0.5)
    assert out.shape[0] == 250
    # kept points have the largest x coordinates
    thresh = np.sort(cloud[:, 0])[-250]
    assert (out[:, 0] >= thresh - 1e-12).all()
    # random plane path
    out2 = T.random_crop_point_cloud_with_plane(cloud, rng=rng, keep_ratio=0.7)
    assert out2.shape[0] == 350


def test_viewpoint_crop_keeps_nearest(cloud, rng):
    vp = np.array([100.0, 0.0, 0.0])
    out = T.random_crop_point_cloud_with_point(cloud, viewpoint=vp, keep_ratio=0.5)
    d = np.linalg.norm(vp - cloud, axis=1)
    thresh = np.sort(d)[249]
    assert (np.linalg.norm(vp - out, axis=1) <= thresh + 1e-12).all()
    out2 = T.random_crop_point_cloud_with_point(cloud, rng=rng, keep_ratio=0.7)
    assert out2.shape[0] == 350
    vp_sample = T.random_sample_viewpoint(rng)
    assert (np.abs(vp_sample) >= 499.0).all()

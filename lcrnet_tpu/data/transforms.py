"""Host-side point-cloud augmentation primitives.

Parity target: `utils/transforms/functional.py` (normalize, first-K /
random sampling with pad-by-wrap, scale+shift, up-axis rotation, rescale,
jitter, shuffle, PointNet++-style dropout, feature jitter, plane- and
viewpoint-crops).  The reference keeps these host-side numpy helpers
(they run inside DataLoader workers) and so do we — the main training
recipe's augmentation lives in `data/kitti.py::augment_pair`; this module
is the general-purpose library surface.

Deviations by design:
- every stochastic function takes an explicit ``rng``
  (``np.random.Generator``) instead of the global numpy/random state;
- ``random_dropout_points`` returns a new array (the reference mutates its
  input in place).
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np

PointsOrPair = Union[np.ndarray, Tuple[np.ndarray, np.ndarray]]


def _with_normals(points, normals, idx=None):
    if idx is not None:
        points = points[idx]
        if normals is not None:
            normals = normals[idx]
    if normals is not None:
        return points, normals
    return points


def normalize_points(points: np.ndarray) -> np.ndarray:
    """Center on the mean and scale into the unit sphere
    (`functional.py:7-11`)."""
    points = points - points.mean(axis=0)
    return points / np.max(np.linalg.norm(points, axis=1))


def sample_points(points, num_samples, normals=None) -> PointsOrPair:
    """First-K sampling (`functional.py:14-21`)."""
    return _with_normals(points[:num_samples],
                         normals[:num_samples] if normals is not None else None)


def random_sample_points(points, num_samples, rng: np.random.Generator,
                         normals=None) -> PointsOrPair:
    """Random permutation sampling; pads by wrapping the permutation when the
    cloud is smaller than num_samples (`functional.py:24-42`)."""
    n = points.shape[0]
    idx = rng.permutation(n)
    if n > num_samples:
        idx = idx[:num_samples]
    elif n < num_samples:
        reps, pad = divmod(num_samples, n)
        idx = np.concatenate([idx] * reps + ([idx[:pad]] if pad else []))
    return _with_normals(points, normals, idx)


def random_scale_shift_points(points, rng: np.random.Generator,
                              low: float = 2.0 / 3.0, high: float = 3.0 / 2.0,
                              shift: float = 0.2, normals=None) -> PointsOrPair:
    """Per-axis anisotropic scale + shift; normals are rescaled and
    renormalized (`functional.py:45-56`)."""
    scale = rng.uniform(low, high, (1, 3))
    bias = rng.uniform(-shift, shift, (1, 3))
    out = points * scale + bias
    if normals is not None:
        n = normals * scale
        return out, n / np.linalg.norm(n, axis=1, keepdims=True)
    return out


def random_rotate_points_along_up_axis(points, rng: np.random.Generator,
                                       normals=None) -> PointsOrPair:
    """Uniform yaw rotation about z (`functional.py:58-73`)."""
    theta = rng.random() * 2.0 * np.pi
    c, s = np.cos(theta), np.sin(theta)
    rot_t = np.array([[c, s, 0.0], [-s, c, 0.0], [0.0, 0.0, 1.0]])
    out = points @ rot_t
    if normals is not None:
        return out, normals @ rot_t
    return out


def random_rescale_points(points, rng: np.random.Generator,
                          low: float = 0.8, high: float = 1.2) -> np.ndarray:
    """Isotropic rescale (`functional.py:76-80`)."""
    return points * rng.uniform(low, high)


def random_jitter_points(points, scale: float, rng: np.random.Generator,
                         noise_magnitude: float = 0.05) -> np.ndarray:
    """Clipped gaussian per-point jitter (`functional.py:83-87`)."""
    noise = np.clip(rng.normal(scale=scale, size=points.shape),
                    -noise_magnitude, noise_magnitude)
    return points + noise


def random_shuffle_points(points, rng: np.random.Generator,
                          normals=None) -> PointsOrPair:
    """Random permutation (`functional.py:90-98`)."""
    return _with_normals(points, normals, rng.permutation(points.shape[0]))


def random_dropout_points(points, max_p: float,
                          rng: np.random.Generator) -> np.ndarray:
    """PointNet++ dropout: each point is collapsed onto points[0] with a
    per-point probability uniform in [0, max_p) (`functional.py:101-107`;
    non-mutating here)."""
    n = points.shape[0]
    p = rng.random(n) * max_p
    masks = rng.random(n) < p
    out = points.copy()
    out[masks] = points[0]
    return out


def random_jitter_features(features, rng: np.random.Generator,
                           mu: float = 0.0, sigma: float = 0.01) -> np.ndarray:
    """FCGF feature jitter, applied with probability 0.95
    (`functional.py:110-114`)."""
    if rng.random() < 0.95:
        features = features + rng.normal(mu, sigma, features.shape).astype(np.float32)
    return features


def random_sample_plane(rng: np.random.Generator) -> np.ndarray:
    """Unit normal of a random plane through the origin
    (`functional.py:117-127`)."""
    phi = rng.uniform(0.0, 2 * np.pi)
    theta = rng.uniform(0.0, np.pi)
    return np.array([np.sin(theta) * np.cos(phi),
                     np.sin(theta) * np.sin(phi),
                     np.cos(theta)])


def random_crop_point_cloud_with_plane(points, rng: Optional[np.random.Generator] = None,
                                       p_normal: Optional[np.ndarray] = None,
                                       keep_ratio: float = 0.7,
                                       normals=None) -> PointsOrPair:
    """Keep the keep_ratio fraction of points on the positive side of a
    plane through the origin (`functional.py:130-143`)."""
    num_samples = int(np.floor(points.shape[0] * keep_ratio + 0.5))
    if p_normal is None:
        p_normal = random_sample_plane(rng or np.random.default_rng())
    idx = np.argsort(-(points @ p_normal))[:num_samples]
    return _with_normals(points, normals, idx)


def random_sample_viewpoint(rng: np.random.Generator, limit: float = 500.0) -> np.ndarray:
    """Random viewpoint in one of the 8 far octants (`functional.py:145-147`)."""
    return rng.random(3) + limit * rng.choice([1.0, -1.0], size=3)


def random_crop_point_cloud_with_point(points, rng: Optional[np.random.Generator] = None,
                                       viewpoint: Optional[np.ndarray] = None,
                                       keep_ratio: float = 0.7,
                                       normals=None) -> PointsOrPair:
    """Keep the keep_ratio fraction of points nearest a viewpoint
    (`functional.py:150-162`)."""
    num_samples = int(np.floor(points.shape[0] * keep_ratio + 0.5))
    if viewpoint is None:
        viewpoint = random_sample_viewpoint(rng or np.random.default_rng())
    idx = np.argsort(np.linalg.norm(viewpoint - points, axis=1))[:num_samples]
    return _with_normals(points, normals, idx)

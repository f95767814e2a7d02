"""Chamfer / EMD / vector-angle ops vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from lcrnet_tpu.ops.chamfer import chamfer_distance, chamfer_loss, emd_auction, modified_chamfer_distance
from lcrnet_tpu.ops.vector_angle import vector_angle

from oracles import random_se3


def test_chamfer_matches_bruteforce(rng):
    x = rng.normal(size=(40, 3)).astype(np.float32)
    y = rng.normal(size=(60, 3)).astype(np.float32)
    dx, dy = chamfer_distance(jnp.asarray(x), jnp.asarray(y))
    d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dx), d2.min(1), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy), d2.min(0), rtol=1e-4, atol=1e-5)


def test_chamfer_respects_masks(rng):
    x = rng.normal(size=(10, 3)).astype(np.float32)
    y = np.concatenate([rng.normal(size=(5, 3)), np.full((5, 3), 100.0)]).astype(np.float32)
    ym = np.array([True] * 5 + [False] * 5)
    # invalid far-away y points must not be chosen even though they exist
    y_close = y.copy()
    y_close[5:] = x[:5]  # invalid but close points
    dx, _ = chamfer_distance(jnp.asarray(x), jnp.asarray(y_close), None, jnp.asarray(ym))
    d2 = ((x[:, None] - y[None, :5]) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(dx), d2.min(1), rtol=1e-4, atol=1e-5)


def test_chamfer_loss_zero_identity(rng):
    x = rng.normal(size=(30, 3)).astype(np.float32)
    loss = chamfer_loss(jnp.asarray(x), jnp.asarray(x))
    assert float(loss) < 1e-6


def test_modified_chamfer_zero_at_gt(rng):
    raw = rng.normal(size=(50, 3)).astype(np.float32)
    t = random_se3(rng).astype(np.float32)
    inv = np.linalg.inv(t)
    src = (raw @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
    d = modified_chamfer_distance(
        jnp.asarray(raw), jnp.asarray(raw), jnp.asarray(src), jnp.asarray(t), jnp.asarray(t)
    )
    assert float(d) < 1e-3


def test_emd_identity_permutation(rng):
    x = rng.normal(size=(32, 3)).astype(np.float32) * 5
    perm = rng.permutation(32)
    y = x[perm]
    assign, mean_d = emd_auction(jnp.asarray(x), jnp.asarray(y), iterations=100)
    # optimal assignment maps each x to its permuted copy: zero distance
    assert float(mean_d) < 1e-3


def test_emd_beats_random_assignment(rng):
    x = rng.normal(size=(24, 3)).astype(np.float32)
    y = rng.normal(size=(24, 3)).astype(np.float32)
    _, mean_d = emd_auction(jnp.asarray(x), jnp.asarray(y), iterations=100)
    d2 = ((x[:, None] - y[None]) ** 2).sum(-1)
    random_cost = np.mean(np.diag(d2))
    # scipy-free sanity: auction should be clearly below the identity pairing
    assert float(mean_d) <= random_cost + 1e-6


def test_vector_angle_known():
    a = jnp.asarray([1.0, 0.0, 0.0])
    b = jnp.asarray([0.0, 1.0, 0.0])
    np.testing.assert_allclose(float(vector_angle(a, b, degrees=True)), 90.0, atol=1e-5)
    np.testing.assert_allclose(float(vector_angle(a, a, degrees=True)), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(vector_angle(a, -a, degrees=True)), 180.0, atol=1e-4)


def test_chamfer_arbitrary_dims(rng):
    """Capability parity with the reference's vendored 2D/5D/6D chamfer
    kernels (`modules/ChamferDistancePytorch/chamfer{2,5,6}D`): the masked
    formulation is dimension-agnostic."""
    for d in (2, 5, 6):
        x = rng.normal(size=(40, d)).astype(np.float32)
        y = rng.normal(size=(30, d)).astype(np.float32)
        dx, dy = chamfer_distance(jnp.asarray(x), jnp.asarray(y))
        d2 = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(dx), d2.min(1), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(dy), d2.min(0), rtol=1e-4, atol=1e-5)

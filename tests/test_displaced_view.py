"""Displaced-viewpoint self-pair synthesis (accuracy protocol realism).

`experiments/accuracy_benchmark.py::displaced_view` re-renders a scan from
a displaced sensor origin (range falloff + per-azimuth occlusion shadows).
These tests pin its geometric contract with a deterministic origin.
"""

import os.path as osp
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "experiments"))

from accuracy_benchmark import displaced_view  # noqa: E402


def _scene():
    """A tall 'wall' arc at 10 m in the +x azimuth band, tall 'far posts'
    at 45 m behind it (same azimuths) and at 45 m in the -x band (clear)."""
    rng = np.random.default_rng(0)
    az_wall = rng.uniform(-0.1, 0.1, 400)
    wall = np.column_stack([10 * np.cos(az_wall), 10 * np.sin(az_wall),
                            rng.uniform(0.5, 3.0, 400)]).astype(np.float32)
    behind = np.column_stack([46 * np.cos(az_wall), 46 * np.sin(az_wall),
                              rng.uniform(0.5, 3.0, 400)]).astype(np.float32)
    az_clear = np.pi + rng.uniform(-0.1, 0.1, 400)
    clear = np.column_stack([46 * np.cos(az_clear), 46 * np.sin(az_clear),
                             rng.uniform(0.5, 3.0, 400)]).astype(np.float32)
    return wall, behind, clear


def test_displaced_view_subset_and_range():
    rng = np.random.default_rng(7)
    pts = rng.uniform(-60, 60, (5000, 3)).astype(np.float32)
    out = displaced_view(pts, np.random.default_rng(3), max_disp=1e-9,
                         sensor_range=50.0)
    # pure filter: every output row is an input row
    as_set = {tuple(p) for p in pts.tolist()}
    assert all(tuple(p) in as_set for p in out.tolist())
    # range limit from the (undisplaced) origin holds
    assert np.all(np.linalg.norm(out[:, :2], axis=1) < 50.0 + 1e-3)
    assert 0 < len(out) < len(pts)


def test_displaced_view_occlusion_shadow():
    wall, behind, clear = _scene()
    pts = np.vstack([wall, behind, clear])
    out = displaced_view(pts, np.random.default_rng(5), max_disp=1e-9,
                         sensor_range=55.0)
    out_set = {tuple(p) for p in out.tolist()}
    kept_behind = sum(tuple(p) in out_set for p in behind.tolist())
    kept_clear = sum(tuple(p) in out_set for p in clear.tolist())
    # points >35 m beyond the 10 m wall in its azimuth band are shadowed
    # (shadow_depth is drawn from [12, 35]); the clear band only thins by
    # the stochastic range falloff (survival ~0.63 at 46 m)
    assert kept_behind == 0
    assert kept_clear > 0.3 * len(clear)


def test_displaced_view_reproducible():
    rng = np.random.default_rng(11)
    pts = rng.uniform(-40, 40, (3000, 3)).astype(np.float32)
    a = displaced_view(pts, np.random.default_rng(9))
    b = displaced_view(pts, np.random.default_rng(9))
    np.testing.assert_array_equal(a, b)

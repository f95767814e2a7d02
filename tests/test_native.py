"""Native C++ host ops vs numpy oracles."""

import numpy as np
import pytest

from lcrnet_tpu.native import (
    grid_subsample_native,
    load_kitti_bin_native,
    native_available,
    radius_neighbors_native,
)

from oracles import grid_subsample_oracle, radius_neighbors_oracle


def test_native_builds():
    assert native_available(), "native lib should build with the baked toolchain"


def test_native_grid_subsample_matches_oracle(rng):
    pts = rng.uniform(-20, 20, (1000, 3)).astype(np.float32)
    got = grid_subsample_native(pts, 1.5)
    want = grid_subsample_oracle(pts.astype(np.float64), 1.5)
    assert len(got) == len(want)
    np.testing.assert_allclose(
        got[np.lexsort(got.T)], want[np.lexsort(want.T)], atol=1e-4
    )


def test_native_radius_neighbors_matches_oracle(rng):
    q = rng.uniform(-5, 5, (80, 3)).astype(np.float32)
    s = rng.uniform(-5, 5, (120, 3)).astype(np.float32)
    radius, limit = 1.5, 12
    idx, counts = radius_neighbors_native(q, s, radius, limit)
    want_idx, want_valid = radius_neighbors_oracle(q, s, radius, limit)
    for i in range(len(q)):
        assert counts[i] == want_valid[i].sum()
        got_set = set(idx[i, : counts[i]].tolist())
        want_set = set(want_idx[i][want_valid[i]].tolist())
        assert got_set == want_set
        # nearest-first ordering
        d = np.linalg.norm(s[idx[i, : counts[i]]] - q[i], axis=1)
        assert np.all(np.diff(d) >= -1e-6)


def test_native_bin_reader(tmp_path, rng):
    pts = rng.normal(size=(500, 4)).astype(np.float32)
    p = tmp_path / "scan.bin"
    pts.tofile(p)
    got = load_kitti_bin_native(str(p))
    np.testing.assert_allclose(got, pts[:, :3], atol=0)
    assert load_kitti_bin_native(str(tmp_path / "missing.bin")) is None

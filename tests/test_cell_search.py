"""Cell-list radius search vs the dense brute-force path."""

import numpy as np
import jax
import jax.numpy as jnp

from lcrnet_tpu.ops.radius_search import radius_search_batched, radius_search_cells_batched


def make_clouds(rng, b=2, n=700, spacing=0.35):
    pts = np.full((b, 768, 3), 1.0e6, np.float32)
    msk = np.zeros((b, 768), bool)
    for i in range(b):
        side = int(np.ceil(np.sqrt(n)))
        xy = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)[:n]
        pts[i, :n, :2] = xy * spacing + rng.uniform(-0.1, 0.1, (n, 2))
        pts[i, :n, 2] = rng.uniform(-0.5, 0.5, n)
        msk[i, :n] = True
    return jnp.asarray(pts), jnp.asarray(msk)


def test_cells_match_dense(rng):
    pts, msk = make_clouds(rng)
    radius, limit = 1.275, 24
    di, dv = radius_search_batched(pts, pts, msk, msk, radius, limit, block_size=256)
    ci, cv = radius_search_cells_batched(
        pts, pts, msk, msk, radius, limit, block_size=256, bucket_capacity=128
    )
    di, dv, ci, cv = map(np.asarray, (di, dv, ci, cv))
    p = np.asarray(pts)
    for b in range(2):
        for i in range(0, 700, 13):
            want = set(di[b, i][dv[b, i]].tolist())
            got = set(ci[b, i][cv[b, i]].tolist())
            assert want == got, (b, i, sorted(want - got), sorted(got - want))
            # nearest-first ordering preserved
            d = np.linalg.norm(p[b][ci[b, i][cv[b, i]]] - p[b, i], axis=1)
            assert np.all(np.diff(d) >= -1e-5)


def test_cells_cross_cloud_queries(rng):
    pts, msk = make_clouds(rng, n=500)
    q = pts[:, :300] + 0.1
    qm = msk[:, :300]
    radius, limit = 2.0, 16
    di, dv = radius_search_batched(q, pts, qm, msk, radius, limit, block_size=128)
    ci, cv = radius_search_cells_batched(q, pts, qm, msk, radius, limit, block_size=128)
    di, dv, ci, cv = map(np.asarray, (di, dv, ci, cv))
    mismatch = 0
    for b in range(2):
        for i in range(0, 300, 7):
            if set(di[b, i][dv[b, i]].tolist()) != set(ci[b, i][cv[b, i]].tolist()):
                mismatch += 1
    assert mismatch == 0

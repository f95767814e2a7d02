"""Pallas banded radius search (interpret mode) vs the XLA banded path."""

import numpy as np
import jax.numpy as jnp

from lcrnet_tpu.ops.radius_search import radius_search_banded_batched
from lcrnet_tpu.ops.radius_search_pallas import radius_search_banded_pallas


def test_pallas_banded_matches_xla(rng):
    n, cap = 900, 1024
    pts = np.full((2, cap, 3), 1.0e6, np.float32)
    msk = np.zeros((2, cap), bool)
    for i in range(2):
        side = 30
        xy = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)[:n]
        pts[i, :n, :2] = xy * 0.35 + rng.uniform(-0.1, 0.1, (n, 2))
        pts[i, :n, 2] = rng.uniform(-0.5, 0.5, n)
        msk[i, :n] = True
    p, m = jnp.asarray(pts), jnp.asarray(msk)
    bi, bv = radius_search_banded_batched(p, p, m, m, 1.275, 20, block_size=256, window=768)
    ci, cv = radius_search_banded_pallas(
        p, p, m, m, 1.275, 20, block_size=256, window=768, interpret=True
    )
    bi, bv, ci, cv = map(np.asarray, (bi, bv, ci, cv))
    for b in range(2):
        for i in range(0, n, 13):
            assert set(bi[b, i][bv[b, i]].tolist()) == set(ci[b, i][cv[b, i]].tolist()), (b, i)
            # nearest-first order
            d = np.linalg.norm(pts[b][ci[b, i][cv[b, i]]] - pts[b, i], axis=1)
            assert np.all(np.diff(d) >= -1e-5)

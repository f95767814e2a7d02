"""Multi-pair forward must reproduce single-pair results exactly."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcrnet_tpu.config import make_test_cfg
from lcrnet_tpu.pipeline import init_params, make_pair_forward, make_pairs_forward

from test_model import make_pair


@pytest.mark.slow
def test_two_pairs_match_singles(rng):
    cfg = make_test_cfg()
    params = init_params(cfg)
    n0 = cfg.shapes.points[0]

    pairs = []
    for seed in (1, 2):
        r = np.random.default_rng(seed)
        ref, src, t = make_pair(r, n=350)
        pts = np.full((2, n0, 3), 1.0e6, np.float32)
        msk = np.zeros((2, n0), bool)
        pts[0, :350], pts[1, :350] = ref, src
        msk[:, :350] = True
        pairs.append((pts, msk))

    single = make_pair_forward(cfg)
    outs = [
        single(params, jnp.asarray(p[0]), jnp.asarray(m[0]), jnp.asarray(p[1]), jnp.asarray(m[1]))
        for p, m in pairs
    ]

    multi = make_pairs_forward(cfg, num_pairs=2)
    batch_p = jnp.asarray(np.stack([p for p, _ in pairs]))
    batch_m = jnp.asarray(np.stack([m for _, m in pairs]))
    mout = multi(params, batch_p, batch_m)

    for i in range(2):
        np.testing.assert_allclose(
            np.asarray(mout["estimated_transform"][i]),
            np.asarray(outs[i]["estimated_transform"]),
            atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(mout["ref_feature_global"][i]),
            np.asarray(outs[i]["ref_feature_global"]),
            atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(mout["node_corr_valid"][i]), np.asarray(outs[i]["node_corr_valid"])
        )

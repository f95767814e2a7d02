"""Checkpoint save/load/merge roundtrip and trainer resume."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcrnet_tpu.config import make_test_cfg
from lcrnet_tpu.engine.checkpoint import latest_step, load_snapshot, merge_netvlad, save_snapshot
from lcrnet_tpu.pipeline import init_params


@pytest.fixture(scope="module")
def params(shared_test_params):
    return shared_test_params


def test_snapshot_roundtrip(tmp_path, params):
    d = str(tmp_path / "snaps")
    save_snapshot(d, 3, params)
    assert latest_step(d) == 3
    loaded = load_snapshot(d, template={"params": params})
    a = jax.tree_util.tree_leaves(params)
    b = jax.tree_util.tree_leaves(loaded["params"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_snapshot_latest_selection(tmp_path, params):
    d = str(tmp_path / "snaps2")
    save_snapshot(d, 1, params)
    bumped = jax.tree.map(lambda x: x + 1.0, params)
    save_snapshot(d, 2, bumped)
    loaded = load_snapshot(d, template={"params": params})
    x0 = jax.tree_util.tree_leaves(params)[0]
    y0 = jax.tree_util.tree_leaves(loaded["params"])[0]
    np.testing.assert_allclose(np.asarray(y0), np.asarray(x0) + 1.0)


def test_merge_netvlad(params):
    other = jax.tree.map(lambda x: x * 0.0 + 7.0, params)
    merged = merge_netvlad(params, other)
    # netvlad subtree comes from `other`
    nv = jax.tree_util.tree_leaves(merged["params"]["netvlad"])
    assert all(float(np.asarray(x).ravel()[0]) == 7.0 for x in nv)
    # everything else untouched
    enc_a = jax.tree_util.tree_leaves(params["params"]["encoder"])
    enc_m = jax.tree_util.tree_leaves(merged["params"]["encoder"])
    for x, y in zip(enc_a, enc_m):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_params_only_template_from_opt_state_snapshot(tmp_path):
    """A snapshot saved WITH opt_state must load into a params-only
    template (descriptor CLIs restore weights from training snapshots that
    carry Adan/Adam state — the reference's strict=False restore)."""
    d = str(tmp_path / "snaps3")
    params = {"params": {"w": jnp.arange(4.0), "b": jnp.zeros(2)}}
    opt_state = {"count": jnp.zeros((), jnp.int32),
                 "m": {"params": {"w": jnp.ones(4), "b": jnp.ones(2)}}}
    save_snapshot(d, 5, params, opt_state)
    loaded = load_snapshot(d, template={"params": params})
    assert set(loaded) == {"params"}
    np.testing.assert_array_equal(
        np.asarray(loaded["params"]["params"]["w"]), np.arange(4.0))

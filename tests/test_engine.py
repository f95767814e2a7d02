"""Tests for the training engine: optimizer, train step, dp/mp sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from lcrnet_tpu.config import make_test_cfg
from lcrnet_tpu.engine.adan import adan
from lcrnet_tpu.engine.train import (
    PairBatch,
    create_train_state,
    make_descriptor_train_step,
    make_train_step,
)
from lcrnet_tpu.parallel.mesh import make_mesh
from lcrnet_tpu.pipeline import init_params

from test_model import make_pair


def _batch(cfg, n_pairs, rng):
    n0 = cfg.shapes.points[0]
    pts = np.full((n_pairs, 2, n0, 3), 1.0e6, np.float32)
    msks = np.zeros((n_pairs, 2, n0), bool)
    ts = np.zeros((n_pairs, 4, 4), np.float32)
    for i in range(n_pairs):
        ref, src, t = make_pair(rng, n=400)
        pts[i, 0, :400], pts[i, 1, :400] = ref, src
        msks[i, 0, :400] = msks[i, 1, :400] = True
        ts[i] = t
    return PairBatch(jnp.asarray(pts), jnp.asarray(msks), jnp.asarray(ts))


def test_adan_minimizes_quadratic():
    x = jnp.array([2.0, -3.0])
    schedule = optax.exponential_decay(1e-1, 50, 0.5)
    tx = adan(schedule)
    state = tx.init(x)
    for _ in range(400):
        g = 2 * x
        updates, state = tx.update(g, state, x)
        x = optax.apply_updates(x, updates)
    assert float(jnp.abs(x).max()) < 5e-2


@pytest.mark.slow
def test_train_step_reduces_loss(rng):
    cfg = make_test_cfg()
    params = init_params(cfg)
    state = create_train_state(cfg, params, steps_per_epoch=10)
    step = make_train_step(cfg)
    batch = _batch(cfg, 1, rng)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(8):
        key, sub = jax.random.split(key)
        state, metrics = step(state, batch, sub)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    # overfitting a single batch must reduce the loss
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_train_step_sharded_matches_unsharded(rng):
    cfg = make_test_cfg()
    params = init_params(cfg)
    mesh = make_mesh(dp=4, mp=2)
    # the train step donates its state; the two states must not alias buffers
    state_a = create_train_state(cfg, jax.tree.map(jnp.copy, params), 10)
    state_b = create_train_state(cfg, jax.tree.map(jnp.copy, params), 10)
    step_plain = make_train_step(cfg)
    step_shard = make_train_step(cfg, mesh=mesh)
    batch = _batch(cfg, 4, rng)
    key = jax.random.PRNGKey(1)
    _, m_a = step_plain(state_a, batch, key)
    _, m_b = step_shard(state_b, batch, key)
    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-3)


@pytest.mark.slow
def test_descriptor_train_step_runs(rng):
    cfg = make_test_cfg()
    params = init_params(cfg)
    state = create_train_state(cfg, params, 10)
    step = make_descriptor_train_step(cfg, num_pos=1, num_neg=2)
    n0 = cfg.shapes.points[0]
    group = 4  # anc + 1 pos + 2 neg
    pts = np.full((2, group, n0, 3), 1.0e6, np.float32)
    msks = np.zeros((2, group, n0), bool)
    for b in range(2):
        for g in range(group):
            ref, _, _ = make_pair(rng, n=300)
            pts[b, g, :300] = ref
            msks[b, g, :300] = True
    state, metrics = step(state, jnp.asarray(pts), jnp.asarray(msks))
    assert np.isfinite(float(metrics["loss"]))


@pytest.mark.slow
def test_frozen_descriptor_step_freezes_encoder(rng):
    """Frozen LD mode (reference offline/half training,
    `LCRNet_GlobalDescrition.py:25-110`): encoder parameters are bit-frozen
    (stop_gradient + masked updates), NetVLAD still trains."""
    cfg = make_test_cfg()
    params = init_params(cfg)
    state = create_train_state(cfg, params, 10, trainable_subtrees=("netvlad",))
    step = make_descriptor_train_step(cfg, num_pos=1, num_neg=1, frozen=True)
    n0 = cfg.shapes.points[0]
    pts = np.full((1, 3, n0, 3), 1.0e6, np.float32)
    msks = np.zeros((1, 3, n0), bool)
    for g in range(3):
        ref, _, _ = make_pair(rng, n=300)
        pts[0, g, :300] = ref
        msks[0, g, :300] = True
    old = jax.tree.map(np.asarray, state.params)
    state2, metrics = step(state, jnp.asarray(pts), jnp.asarray(msks))
    assert np.isfinite(float(metrics["loss"]))
    for name in ("encoder", "transformer", "vote_encoder", "kpdecoder"):
        ol = jax.tree.leaves(old["params"][name])
        nl = jax.tree.leaves(state2.params["params"][name])
        assert all(np.array_equal(a, b) for a, b in zip(ol, nl)), f"{name} drifted"
    nv_old = jax.tree.leaves(old["params"]["netvlad"])
    nv_new = jax.tree.leaves(state2.params["params"]["netvlad"])
    assert any(not np.array_equal(a, b) for a, b in zip(nv_old, nv_new))


@pytest.mark.slow
def test_half_mode_matches_frozen_mode(rng):
    """Cached-feature half mode (reference `LCRNet_GlobalDescrition.py:78-86`)
    is optimization-identical to the frozen mode when the cache holds the
    same encoder's stage-4 features: same triplet loss, same NetVLAD update."""
    from lcrnet_tpu.engine.train import make_descriptor_train_step_half
    from lcrnet_tpu.models.lcrnet import LCRNet
    from lcrnet_tpu.pipeline import build_batch_pyramid

    cfg = make_test_cfg()
    params = init_params(cfg)
    n0 = cfg.shapes.points[0]
    group = 3  # anc + 1 pos + 1 neg
    pts = np.full((1, group, n0, 3), 1.0e6, np.float32)
    msks = np.zeros((1, group, n0), bool)
    for g in range(group):
        ref, _, _ = make_pair(rng, n=300)
        pts[0, g, :300] = ref
        msks[0, g, :300] = True
    pts_j, msks_j = jnp.asarray(pts), jnp.asarray(msks)

    # pre-extract stage-4 features for the pos/neg members (what
    # preextract_features.py dumps), with per-cloud norm statistics
    model = LCRNet(cfg)

    @jax.jit
    def encode(params, points, masks):
        pyr = build_batch_pyramid(points, masks, cfg)
        feats = pyr.masks[0][..., None].astype(jnp.float32)
        feats_list = model.apply(
            params, feats, pyr, 1,
            method=lambda m, f, p, n: m.encoder(f, p, norm_clouds=n))
        return feats_list[3], pyr.masks[3]

    cached_f, cached_m = encode(params, pts_j[0, 1:], msks_j[0, 1:])

    state_f = create_train_state(
        cfg, jax.tree.map(jnp.copy, params), 10, trainable_subtrees=("netvlad",))
    state_h = create_train_state(
        cfg, jax.tree.map(jnp.copy, params), 10, trainable_subtrees=("netvlad",))

    frozen_step = make_descriptor_train_step(cfg, num_pos=1, num_neg=1, frozen=True)
    half_step = make_descriptor_train_step_half(cfg, num_pos=1, num_neg=1)

    state_f, m_f = frozen_step(state_f, pts_j, msks_j)
    # device-resident cache rows [pos, neg]; the tuple indexes them 0, 1
    idx = jnp.asarray(np.array([[0, 1]], np.int32))
    state_h, m_h = half_step(
        state_h, pts_j[:, 0], msks_j[:, 0], cached_f, cached_m, idx)

    np.testing.assert_allclose(float(m_h["loss"]), float(m_f["loss"]), rtol=1e-5)
    nv_f = jax.tree.leaves(state_f.params["params"]["netvlad"])
    nv_h = jax.tree.leaves(state_h.params["params"]["netvlad"])
    for a, b in zip(nv_f, nv_h):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)
    # and the encoder stayed bit-frozen in half mode
    for name in ("encoder", "transformer", "vote_encoder", "kpdecoder"):
        ol = jax.tree.leaves(params["params"][name])
        nl = jax.tree.leaves(state_h.params["params"][name])
        assert all(np.array_equal(a, b) for a, b in zip(ol, nl)), f"{name} drifted"


@pytest.mark.slow
def test_sharded_step_collective_inventory(rng):
    """The dp x mp-sharded step must not all-gather whole point-axis
    activations: XLA should compute on local point shards and psum partial
    results.  Guard: every collective payload stays under the size of one
    full stage-0 activation tensor; gradient all-reduces are present."""
    from lcrnet_tpu.parallel.analyze import collective_inventory
    from lcrnet_tpu.parallel.mesh import make_mesh

    cfg = make_test_cfg()
    mesh = make_mesh(dp=4, mp=2)
    params = init_params(cfg)
    state = create_train_state(cfg, params, 10)
    step = make_train_step(cfg, mesh=mesh)
    n0 = cfg.shapes.points[0]
    batch = PairBatch(
        jnp.zeros((4, 2, n0, 3)), jnp.zeros((4, 2, n0), bool), jnp.zeros((4, 4, 4))
    )
    comp = step.lower(state, batch, jax.random.PRNGKey(0)).compile()
    inv = collective_inventory(comp)
    assert any(d["op"] == "all-reduce" for d in inv), "gradient psum missing"
    # all-reduces are inherent (dp gradient sums + mp partial sums); the
    # failure mode is an ALL-GATHER that re-materializes the full point-axis
    # activations per device.  Bound: 2x one pair's stage-0 feature tensor.
    bound = 2 * (2 * n0 * 128 * 4)
    offenders = [d for d in inv if d["op"] == "all-gather" and d["bytes"] > bound]
    assert not offenders, f"oversized all-gathers: {offenders[:3]}"


@pytest.mark.slow
def test_train_multistep_matches_sequential(rng):
    """K scanned steps in one dispatch == K sequential step() calls
    (identical params/opt-state chain; the key schedule matches because
    multistep splits the same base key)."""
    from lcrnet_tpu.engine.train import make_train_multistep

    cfg = make_test_cfg()
    params = init_params(cfg)
    k = 2
    batches = [_batch(cfg, 1, rng) for _ in range(k)]
    key = jax.random.PRNGKey(42)

    step = make_train_step(cfg)
    # the jitted steps donate their state: each state needs its own buffers
    params_a = jax.tree.map(jnp.copy, params)
    params_b = jax.tree.map(jnp.copy, params)
    state_a = create_train_state(cfg, params_a, steps_per_epoch=10)
    keys = jax.random.split(key, k)
    for i in range(k):
        state_a, _ = step(state_a, batches[i], keys[i])

    multi = make_train_multistep(cfg, k)
    state_b = create_train_state(cfg, params_b, steps_per_epoch=10)
    stacked = PairBatch(
        points=jnp.stack([b.points for b in batches]),
        masks=jnp.stack([b.masks for b in batches]),
        transform=jnp.stack([b.transform for b in batches]),
    )
    state_b, metrics = multi(state_b, stacked, key)

    flat_a = jax.tree_util.tree_leaves(state_a.params)
    flat_b = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-6)
    assert np.isfinite(float(metrics["loss"]))


def test_ema_train_state_tracks_polyak_average():
    """EMA params follow d*ema + (1-d)*params on every apply_gradients, the
    default (ema off) path is unchanged, and the state round-trips through
    jit/scan as a pytree."""
    from lcrnet_tpu.engine.train import TrainState

    params = {"params": {"w": jnp.ones((4,))}}
    tx = optax.sgd(0.5)
    state = TrainState.create(
        apply_fn=None, params=jax.tree.map(jnp.copy, params), tx=tx,
        ema_params=jax.tree.map(jnp.copy, params), ema_decay=0.8)
    grads = {"params": {"w": jnp.full((4,), 2.0)}}

    @jax.jit
    def two_steps(s):
        def body(s, _):
            return s.apply_gradients(grads=grads), None
        s, _ = jax.lax.scan(body, s, None, length=2)
        return s

    out = two_steps(state)
    # raw: 1 -> 0 -> -1; ema: 1 -> 0.8 -> 0.8*0.8 + 0.2*(-1) = 0.44
    np.testing.assert_allclose(np.asarray(out.params["params"]["w"]), -1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out.ema_params["params"]["w"]), 0.44, atol=1e-6)
    assert out.eval_params is out.ema_params

    plain = TrainState.create(apply_fn=None, params=params, tx=tx)
    plain = jax.jit(lambda s: s.apply_gradients(grads=grads))(plain)
    assert plain.ema_params is None and plain.eval_params is plain.params


@pytest.mark.slow
def test_sharded_step_collective_inventory_real_shapes(rng):
    """Same collective guard at the PRODUCTION shape budget (20480-point
    stage 0): collective pathology is shape-dependent — XLA's propagation
    choices at 512 points say nothing about 20480.  Compile-only (no
    execution), so this costs one CPU compile, cached across runs."""
    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.parallel.analyze import collective_inventory
    from lcrnet_tpu.parallel.mesh import make_mesh

    cfg = make_cfg()
    mesh = make_mesh(dp=4, mp=2)
    params = jax.eval_shape(lambda: init_params(cfg))
    state = jax.eval_shape(
        lambda p: create_train_state(cfg, p, 10), params
    )
    step = make_train_step(cfg, mesh=mesh)
    n0 = cfg.shapes.points[0]
    batch = PairBatch(
        jax.ShapeDtypeStruct((4, 2, n0, 3), jnp.float32),
        jax.ShapeDtypeStruct((4, 2, n0), jnp.bool_),
        jax.ShapeDtypeStruct((4, 4, 4), jnp.float32),
    )
    comp = step.lower(state, batch, jax.random.PRNGKey(0)).compile()
    inv = collective_inventory(comp)
    assert any(d["op"] == "all-reduce" for d in inv), "gradient psum missing"
    # Regression guard at the measured level (908 MB/step after the
    # SPMD-safe MaskedGroupNorm rewrite; was 1363 MB before it).  The
    # residual traffic is the cross-shard banded-search blocks and conv
    # feature gathers + their backward scatter partial-sums — the automatic
    # SPMD cost of point-axis mp.  The ring-halo shard_map train step
    # (engine/train.py::make_train_step_mp) is the scalable alternative:
    # 244 MB/step at the same shapes (tests/test_halo.py::
    # test_mp_train_step_collective_inventory_real_shapes).
    total = sum(d["bytes"] for d in inv)
    assert total < 1000e6, f"mp collective traffic grew: {total / 1e6:.0f} MB"
    biggest = max((d["bytes"] for d in inv), default=0)
    assert biggest < 200e6, f"new dominant collective: {biggest / 1e6:.0f} MB"

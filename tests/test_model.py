"""End-to-end model family tests on tiny shapes (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lcrnet_tpu.config import make_test_cfg
from lcrnet_tpu.models.lcrnet import LCRNet
from lcrnet_tpu.models.losses import evaluate_pair, overall_loss, triplet_loss
from lcrnet_tpu.ops.pyramid import build_pyramid

from oracles import random_se3


def make_pair(rng, n=400, cfg=None):
    """Synthetic overlapping pair: a jittered grid patch and its rigid move."""
    side = int(np.ceil(np.sqrt(n)))
    xy = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)[:n]
    ref = np.zeros((n, 3), np.float32)
    ref[:, :2] = xy * 0.4 + rng.uniform(-0.05, 0.05, (n, 2))
    ref[:, 2] = np.sin(ref[:, 0] * 0.7) + rng.uniform(-0.02, 0.02, n)
    t = random_se3(rng, max_angle=0.5, max_trans=1.0).astype(np.float32)
    inv = np.linalg.inv(t)
    src = (ref @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)  # ref = T @ src
    return ref, src, t


def build_pair_pyramid(cfg, ref, src):
    caps = cfg.shapes.points
    lims = cfg.shapes.neighbor_limits

    def pad(pts):
        out = np.full((caps[0], 3), 1.0e6, np.float32)
        out[: len(pts)] = pts
        m = np.zeros(caps[0], bool)
        m[: len(pts)] = True
        return jnp.asarray(out), jnp.asarray(m)

    rp, rm = pad(ref)
    sp, sm = pad(src)
    return jax.jit(
        jax.vmap(lambda p, m: build_pyramid(p, m, caps, lims, 0.3, 1.275))
    )(jnp.stack([rp, sp]), jnp.stack([rm, sm]))


@pytest.fixture(scope="module")
def setup(shared_test_params):
    rng = np.random.default_rng(7351)
    cfg = make_test_cfg()
    ref, src, t = make_pair(rng, n=400)
    pyramid = build_pair_pyramid(cfg, ref, src)
    model = LCRNet(cfg)
    # parameter values are input-independent (standard initializers), so the
    # session-shared init_params tree is the same tree model.init would build
    params = shared_test_params
    return cfg, model, params, pyramid, jnp.asarray(t)


@pytest.fixture(scope="module")
def jitted(setup):
    """Jitted forward variants: eager flax apply on CPU is ~60 s per call,
    the jitted programs land in the session persistent cache instead."""
    cfg, model, _, _, _ = setup
    fwd_eval = jax.jit(lambda p, pyr, t: model.apply(p, pyr, t, training=False))
    train_losses = jax.jit(
        lambda p, pyr, t, key: overall_loss(
            model.apply(
                p, pyr, t, training=True, with_fine_matching=False,
                rngs={"sampling": key},
            ),
            t,
            cfg,
        )
    )
    describe = jax.jit(lambda p, pyr: model.apply(p, pyr, method=LCRNet.describe))
    return fwd_eval, train_losses, describe


def test_forward_eval_shapes(setup, jitted):
    cfg, model, params, pyramid, t = setup
    out = jitted[0](params, pyramid, t)
    assert out["ref_feature_global"].shape == (256,)
    assert out["src_feature_global"].shape == (256,)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(out["ref_feature_global"])), 1.0, atol=1e-4
    )
    assert out["nodes"].shape == (2, cfg.shapes.max_nodes, 3)
    assert out["estimated_transform"].shape == (4, 4)
    assert np.isfinite(np.asarray(out["estimated_transform"])).all()
    # some nodes and correspondences exist
    assert int(np.asarray(out["node_masks"]).sum()) > 4
    assert int(np.asarray(out["corr_valid"]).sum()) > 0


def test_forward_train_losses_finite(setup, jitted):
    cfg, model, params, pyramid, t = setup
    losses = jitted[1](params, pyramid, t, jax.random.PRNGKey(2))
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite: {v}"
    assert float(losses["loss"]) > 0


@pytest.mark.slow
def test_gradients_flow(setup):
    cfg, model, params, pyramid, t = setup

    def loss_fn(p):
        out = model.apply(
            p, pyramid, t, training=True, with_fine_matching=False,
            rngs={"sampling": jax.random.PRNGKey(3)},
        )
        return overall_loss(out, t, cfg)["loss"]

    grads = jax.grad(loss_fn)(params)
    flat = jax.tree_util.tree_leaves(grads)
    norms = [float(jnp.linalg.norm(g)) for g in flat]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) > len(norms) * 0.5  # most params get grads


def test_describe_path(setup, jitted):
    cfg, model, params, pyramid, t = setup
    desc = jitted[2](params, pyramid)
    assert desc.shape == (2, 256)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(desc), axis=1), 1.0, atol=1e-4)


def test_identity_pair_descriptor_match(setup, jitted):
    """Same cloud twice -> identical descriptors."""
    cfg, model, params, _, _ = setup
    rng = np.random.default_rng(3)
    ref, _, _ = make_pair(rng, n=300)
    pyr = build_pair_pyramid(cfg, ref, ref.copy())
    desc = jitted[2](params, pyr)
    d = np.linalg.norm(np.asarray(desc[0]) - np.asarray(desc[1]))
    assert d < 1e-4


def test_triplet_loss_values():
    anc = jnp.zeros((2, 1, 4))
    pos = jnp.zeros((2, 2, 4))
    neg = jnp.ones((2, 3, 4))  # dist^2 = 4 > margin
    loss = triplet_loss(anc, pos, neg, margin=0.5)
    assert float(loss) == 0.0
    neg2 = jnp.zeros((2, 3, 4))  # dist 0 -> each contributes margin
    loss2 = triplet_loss(anc, pos, neg2, margin=0.5)
    np.testing.assert_allclose(float(loss2), 1.5, atol=1e-6)


def test_evaluator_perfect_estimate(setup, jitted):
    cfg, model, params, pyramid, t = setup
    out = jitted[0](params, pyramid, t)
    out = dict(out)
    out["estimated_transform"] = t  # pretend perfect
    res = evaluate_pair(out, t, cfg)
    assert float(res["RRE"]) < 1e-3
    assert float(res["RTE"]) < 1e-3
    assert float(res["RR"]) == 1.0


def test_kpconv_precomputed_influence_exact(rng):
    """KPConv(influence=precomputed) must be bit-identical to the in-conv
    computation (the encoder hoists influence across blocks sharing a
    table)."""
    from lcrnet_tpu.models.kpconv import KPConv, kpconv_influence
    from lcrnet_tpu.models.kernel_points import load_kernel_points

    b, n, h, c = 2, 256, 10, 8
    pts = rng.uniform(-5, 5, (b, n, 3)).astype(np.float32)
    mask = rng.random((b, n)) > 0.1
    idx = rng.integers(0, n, (b, n, h)).astype(np.int32)
    msk = (rng.random((b, n, h)) > 0.3) & np.stack([mask[i][idx[i]] for i in range(b)])
    feats = rng.normal(size=(b, n, c)).astype(np.float32)

    conv = KPConv(in_channels=c, out_channels=4, kernel_size=15, radius=1.0,
                  sigma=0.6, query_block=128)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(feats), jnp.asarray(pts),
                       jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(msk))
    plain = conv.apply(params, jnp.asarray(feats), jnp.asarray(pts), jnp.asarray(pts),
                       jnp.asarray(idx), jnp.asarray(msk))
    kp = jnp.asarray(load_kernel_points(1.0, 15))
    infl = kpconv_influence(jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(idx),
                            jnp.asarray(msk), kp, 0.6, query_block=128)
    hoisted = conv.apply(params, jnp.asarray(feats), jnp.asarray(pts), jnp.asarray(pts),
                         jnp.asarray(idx), jnp.asarray(msk), influence=infl)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(hoisted))

    # the conv's own inline influence (return_influence=True, the encoder's
    # reuse path) must equal kpconv_influence bit-for-bit, and feeding it
    # back must reproduce the plain output
    returned, infl_inline = conv.apply(
        params, jnp.asarray(feats), jnp.asarray(pts), jnp.asarray(pts),
        jnp.asarray(idx), jnp.asarray(msk), return_influence=True)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(returned))
    np.testing.assert_array_equal(np.asarray(infl), np.asarray(infl_inline))
    reused = conv.apply(params, jnp.asarray(feats), jnp.asarray(pts), jnp.asarray(pts),
                        jnp.asarray(idx), jnp.asarray(msk), influence=infl_inline)
    np.testing.assert_array_equal(np.asarray(plain), np.asarray(reused))


def test_kpconv_unrolled_map_matches_lax_map(rng, monkeypatch):
    """The TPU path unrolls the conv's block map (static slices instead of
    per-iteration scan operand copies, ~11 ms/forward, PROFILE_r05); the
    unrolled program must match lax.map numerically on every output —
    conv, shortcut maxpool, and streamed influence."""
    from lcrnet_tpu.models.kpconv import KPConv

    b, n, m, h, cin = 2, 300, 200, 12, 8
    sf = jnp.asarray(rng.normal(size=(b, n, cin)).astype(np.float32))
    qp = jnp.asarray(rng.uniform(-5, 5, (b, m, 3)).astype(np.float32))
    sp = jnp.asarray(rng.uniform(-5, 5, (b, n, 3)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, n, (b, m, h)))
    msk = jnp.asarray(rng.random((b, m, h)) < 0.8)
    aux = jnp.asarray(rng.normal(size=(b, n, 4)).astype(np.float32))

    conv = KPConv(cin, 16, 15, 2.0, 1.0, query_block=64)
    params = conv.init(jax.random.PRNGKey(0), sf, qp, sp, idx, msk)
    outs = {}
    for flag in ("0", "1"):
        monkeypatch.setenv("LCRNET_UNROLL_CONV_MAP", flag)
        o, pooled, infl = conv.apply(
            params, sf, qp, sp, idx, msk, aux_maxpool=aux,
            return_influence=True)
        outs[flag] = (np.asarray(o), np.asarray(pooled),
                      np.asarray(infl, np.float32))
    for a, b_ in zip(outs["0"], outs["1"]):
        np.testing.assert_allclose(a, b_, atol=1e-5)


def test_init_params_shape_budget_invariant():
    """`pipeline.init_params` initializes on a tiny synthetic pyramid for
    speed (pipeline.py:90-134), which is only sound while parameter shapes
    depend on channel widths alone.  Guard that invariant: an abstract
    (`jax.eval_shape`, zero-FLOP) init of the FULL production config at its
    real shape budget must produce the exact same parameter tree
    (structure, shapes, dtypes) as the fast path.  If anyone adds a
    shape-budget-dependent parameter this fails loudly instead of letting
    checkpoints silently init wrong (VERDICT r1 weak #8)."""
    from lcrnet_tpu.config import make_cfg
    from lcrnet_tpu.models.lcrnet import LCRNet
    from lcrnet_tpu.pipeline import build_batch_pyramid, init_params

    cfg = make_cfg()
    fast = init_params(cfg)

    model = LCRNet(cfg)
    n0 = cfg.shapes.points[0]

    def abstract_init(pts, msk):
        pyramid = build_batch_pyramid(pts, msk, cfg)
        return model.init(
            {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
            pyramid,
            jnp.eye(4),
            training=True,
            with_fine_matching=False,
        )

    full = jax.eval_shape(
        abstract_init,
        jax.ShapeDtypeStruct((2, n0, 3), jnp.float32),
        jax.ShapeDtypeStruct((2, n0), jnp.bool_),
    )

    fast_shapes = jax.tree.map(lambda x: (x.shape, str(x.dtype)), fast)
    full_shapes = jax.tree.map(lambda x: (x.shape, str(x.dtype)), full)
    assert jax.tree_util.tree_structure(fast_shapes) == jax.tree_util.tree_structure(full_shapes)
    assert fast_shapes == full_shapes

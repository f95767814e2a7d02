"""Checkpoint-converter test: synthetic reference state_dict -> flax tree.

Builds a torch-layout state_dict with the reference's exact key names and
shapes (module tree per SURVEY.md §2.3/2.4), converts it, and verifies the
result loads into the real model (tree structure + shapes match) and that
linear weights were transposed.
"""

import os.path as osp

import numpy as np
import jax
import pytest

from lcrnet_tpu.config import make_cfg, make_test_cfg
from lcrnet_tpu.engine.convert import convert_state_dict
from lcrnet_tpu.pipeline import init_params


def synth_reference_state_dict(rng):
    """Reference key layout for the full LCRNet at canonical dims."""
    sd = {}

    def lin(prefix, din, dout, bias=True):
        sd[prefix + ".weight"] = rng.normal(size=(dout, din)).astype(np.float32)
        if bias:
            sd[prefix + ".bias"] = rng.normal(size=(dout,)).astype(np.float32)

    def norm(prefix, d):
        sd[prefix + ".weight"] = rng.normal(size=(d,)).astype(np.float32)
        sd[prefix + ".bias"] = rng.normal(size=(d,)).astype(np.float32)

    def kpconv(prefix, cin, cout):
        sd[prefix + ".weights"] = rng.normal(size=(15, cin, cout)).astype(np.float32)
        sd[prefix + ".bias"] = rng.normal(size=(cout,)).astype(np.float32)

    def unary(prefix, din, dout):
        lin(prefix + ".mlp", din, dout)
        norm(prefix + ".norm.norm", dout)

    def residual(prefix, cin, cout):
        mid = cout // 4
        unary(prefix + ".unary1", cin, mid)
        kpconv(prefix + ".KPConv", mid, mid)
        norm(prefix + ".norm_conv.norm", mid)
        unary(prefix + ".unary2", mid, cout)
        if cin != cout:
            unary(prefix + ".unary_shortcut", cin, cout)

    # encoder
    kpconv("encoder.encoder1_1.KPConv", 1, 64)
    norm("encoder.encoder1_1.norm.norm", 64)
    dims = [
        ("encoder.encoder1_2", 64, 128), ("encoder.encoder2_1", 128, 128),
        ("encoder.encoder2_2", 128, 256), ("encoder.encoder2_3", 256, 256),
        ("encoder.encoder3_1", 256, 256), ("encoder.encoder3_2", 256, 512),
        ("encoder.encoder3_3", 512, 512), ("encoder.encoder4_1", 512, 512),
        ("encoder.encoder4_2", 512, 1024), ("encoder.encoder4_3", 1024, 1024),
    ]
    for name, ci, co in dims:
        residual(name, ci, co)

    # transformer
    lin("transformer.embedding.encoder", 3, 128)
    lin("transformer.embedding.encoder2", 128, 64)
    lin("transformer.in_proj", 1024, 128)
    lin("transformer.out_proj", 128, 256)
    for i in range(8):
        base = f"transformer.transformer.layers.{i}"
        lin(base + ".attention.attention.proj_q", 128, 128)
        lin(base + ".attention.attention.proj_k", 128, 128)
        lin(base + ".attention.attention.proj_v", 128, 128)
        lin(base + ".attention.linear", 128, 128)
        norm(base + ".attention.norm", 128)
        lin(base + ".output.expand", 128, 256)
        lin(base + ".output.squeeze", 256, 128)
        norm(base + ".output.norm", 128)

    # vote
    lin("vote_encoder.vote.mlp_modules.0", 256, 512)
    norm("vote_encoder.vote.mlp_modules.1", 512)
    lin("vote_encoder.vote.mlp_modules.3", 512, 256)
    norm("vote_encoder.vote.mlp_modules.4", 256)
    lin("vote_encoder.vote.ctr_reg", 256, 3)
    residual("vote_encoder.encoder6_1", 256, 256)
    residual("vote_encoder.encoder6_2", 256, 512)
    residual("vote_encoder.encoder6_3", 512, 512)

    # heads
    lin("proj_node_overlap_score", 512, 1)
    unary("kpdecoder.decoder3", 768, 512)
    unary("kpdecoder.decoder2", 768, 256)
    lin("kpdecoder.decoder1.mlp", 384, 128)

    sd["netvlad.cluster_weights"] = rng.normal(size=(1024, 64)).astype(np.float32)
    sd["netvlad.cluster_weights2"] = rng.normal(size=(1, 1024, 64)).astype(np.float32)
    sd["netvlad.hidden1_weights"] = rng.normal(size=(64 * 1024, 256)).astype(np.float32)
    norm("netvlad.bn1", 64)
    norm("netvlad.bn2", 256)
    sd["netvlad.context_gating.gating_weights"] = rng.normal(size=(256, 256)).astype(np.float32)
    norm("netvlad.context_gating.bn1", 256)

    sd["node_optimal_transport.alpha"] = np.float32(1.0)
    sd["optimal_transport.alpha"] = np.float32(1.0)
    return sd


def _convert_key(path_elem):
    s = str(path_elem)
    return s


def test_convert_matches_model_tree(rng):
    sd = synth_reference_state_dict(rng)
    converted = convert_state_dict(sd)

    # init the real model (canonical channel dims, tiny point budgets)
    cfg = make_cfg(shapes=make_test_cfg().shapes)
    params = init_params(cfg)

    ref_paths = {
        jax.tree_util.keystr(p): leaf.shape
        for p, leaf in jax.tree_util.tree_leaves_with_path(params)
    }
    got_paths = {
        jax.tree_util.keystr(p): np.asarray(leaf).shape
        for p, leaf in jax.tree_util.tree_leaves_with_path(converted)
    }
    missing = set(ref_paths) - set(got_paths)
    extra = set(got_paths) - set(ref_paths)
    assert not missing, f"converter missing params: {sorted(missing)[:8]}"
    assert not extra, f"converter extra params: {sorted(extra)[:8]}"
    for k in ref_paths:
        assert tuple(ref_paths[k]) == tuple(got_paths[k]), (
            k, ref_paths[k], got_paths[k])

    # linear transpose: in_proj torch (128, 1024) -> kernel (1024, 128)
    kernel = converted["params"]["transformer"]["Dense_0"]["kernel"]
    np.testing.assert_allclose(kernel, sd["transformer.in_proj.weight"].T)
    # KPConv weights carried through unchanged
    np.testing.assert_allclose(
        converted["params"]["encoder"]["ConvBlock_0"]["KPConv_0"]["weights"],
        sd["encoder.encoder1_1.KPConv.weights"],
    )


@pytest.mark.slow
def test_converted_params_run_forward(rng):
    sd = synth_reference_state_dict(rng)
    converted = jax.tree.map(lambda x: np.asarray(x), convert_state_dict(sd))

    import jax.numpy as jnp

    from lcrnet_tpu.models.lcrnet import LCRNet
    from lcrnet_tpu.pipeline import build_batch_pyramid

    cfg = make_cfg(shapes=make_test_cfg().shapes)
    model = LCRNet(cfg)
    n0 = cfg.shapes.points[0]
    pts = np.full((2, n0, 3), 1.0e6, np.float32)
    msk = np.zeros((2, n0), bool)
    side = 20
    xy = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)
    for b in range(2):
        pts[b, :400, :2] = xy * 0.4
        pts[b, :400, 2] = 0.0
        msk[b, :400] = True
    pyramid = build_batch_pyramid(jnp.asarray(pts), jnp.asarray(msk), cfg)
    out = model.apply(converted, pyramid, None, training=False, with_fine_matching=False)
    assert np.isfinite(np.asarray(out["node_matching_scores"])).any()


def test_reverse_convert_roundtrip(rng):
    """flax -> torch -> flax is the identity, and torch -> flax -> torch
    reproduces every key the forward map consumes (the reverse converter is
    the cross-implementation pose-parity path: a tree trained here must load
    into the reference's own torch LCRNet)."""
    from lcrnet_tpu.engine.convert import convert_params_to_state_dict

    sd = synth_reference_state_dict(rng)
    converted = convert_state_dict(sd)

    # torch -> flax -> torch: identical key set, identical values
    sd_back = convert_params_to_state_dict(converted)
    assert set(sd_back) == set(sd), (
        sorted(set(sd) ^ set(sd_back))[:8])
    for k in sd:
        np.testing.assert_array_equal(
            np.asarray(sd_back[k]), np.asarray(sd[k]), err_msg=k)

    # flax -> torch -> flax: identical tree
    roundtrip = convert_state_dict(sd_back)
    a = {jax.tree_util.keystr(p): leaf
         for p, leaf in jax.tree_util.tree_leaves_with_path(converted)}
    b = {jax.tree_util.keystr(p): leaf
         for p, leaf in jax.tree_util.tree_leaves_with_path(roundtrip)}
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


REFERENCE_PLY = "/root/reference/experiments/lcrnet/modules/kpconv/dispositions/k_015_center_3D.ply"


def test_reference_disposition_install(tmp_path):
    """Parity chain for the reference kernel geometry
    (`kernel_points.py:426-455`): parse the shipped binary PLY, install it,
    and verify `load_kernel_points` uses it (scaled by the conv radius)."""
    from lcrnet_tpu.models import kernel_points as kp

    if not osp.exists(REFERENCE_PLY):
        pytest.skip("reference disposition PLY not present")
    pts = kp.parse_ply_xyz(REFERENCE_PLY)
    assert pts.shape == (15, 3)
    # KPConv convention: center point at the origin, ring at ~0.66
    np.testing.assert_allclose(pts[0], 0.0, atol=1e-6)
    radii = np.linalg.norm(pts[1:], axis=1)
    assert np.all((radii > 0.6) & (radii < 0.72))

    try:
        kp.set_unit_dispositions(pts)
        scaled = kp.load_kernel_points(1.275, 15)
        np.testing.assert_allclose(scaled, pts * 1.275, rtol=1e-6)
    finally:
        kp.set_unit_dispositions(None)
    # override cleared: back to the seeded defaults
    assert not np.allclose(kp.load_kernel_points(1.275, 15), pts * 1.275)


def test_parse_ply_ascii(tmp_path):
    from lcrnet_tpu.models.kernel_points import parse_ply_xyz

    pts = np.array([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0], [-1.5, 0.25, 9.0]])
    body = "\n".join(" ".join(f"{v:.6f}" for v in row) for row in pts)
    ply = (
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float32 x\nproperty float32 y\nproperty float32 z\n"
        "end_header\n" + body + "\n"
    )
    p = tmp_path / "k.ply"
    p.write_text(ply)
    got = parse_ply_xyz(str(p))
    np.testing.assert_allclose(got, pts, atol=1e-6)


@pytest.mark.slow
def test_convert_cli_roundtrip(tmp_path, rng):
    """Full converter chain: synth torch .tar -> convert_snapshot.py ->
    orbax snapshot -> load_snapshot -> model forward runs (the 'demo
    --snapshot accepts a converted tree' contract)."""
    import subprocess
    import sys as _sys

    import torch

    sd = synth_reference_state_dict(rng)
    tar = tmp_path / "ref.tar"
    torch.save({"model": {k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()}}, tar)

    out = tmp_path / "snap"
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    env = {"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin", "HOME": "/root"}
    r = subprocess.run(
        [_sys.executable, osp.join(repo, "experiments", "convert_snapshot.py"),
         "--torch_snapshot", str(tar), "--output", str(out),
         "--dispositions", REFERENCE_PLY if osp.exists(REFERENCE_PLY) else None]
        if osp.exists(REFERENCE_PLY) else
        [_sys.executable, osp.join(repo, "experiments", "convert_snapshot.py"),
         "--torch_snapshot", str(tar), "--output", str(out)],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]

    from lcrnet_tpu.config import make_cfg, make_test_cfg
    from lcrnet_tpu.engine.checkpoint import load_snapshot
    from lcrnet_tpu.pipeline import init_params

    cfg = make_cfg(shapes=make_test_cfg().shapes)
    template = {"params": init_params(cfg)}
    loaded = load_snapshot(str(out), template=template)
    kernel = loaded["params"]["params"]["transformer"]["Dense_0"]["kernel"]
    np.testing.assert_allclose(np.asarray(kernel), sd["transformer.in_proj.weight"].T)

"""Reference-checkpoint converter: torch state_dict -> flax param tree.

Maps the reference's `.tar` snapshot layout (module tree documented in
SURVEY.md §2.3/2.4; e.g. `encoder.encoder1_1.KPConv.weights`,
`transformer.transformer.layers.0.attention.attention.proj_q.weight`,
`netvlad.cluster_weights`, `optimal_transport.alpha`) onto this framework's
parameter tree so users of the reference can bring their trained weights.

Transforms: torch Linear weights (out, in) are transposed to flax kernels
(in, out); norm `weight` becomes `scale`; KPConv weights (K, C_in, C_out)
carry over unchanged.

Caveat for bit-parity: the reference randomizes its kernel-point
dispositions at every model build (`kernel_points.py:428-452`), so exact
reproduction of a given checkpoint additionally requires the dispositions
that were live in that process; use
`lcrnet_tpu.models.kernel_points.set_unit_dispositions()` to install them
(e.g. parsed from the shipped `k_015_center_3D.ply`).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# (reference torch prefix, flax path, channel signature (in, out) for blocks)
_ENCODER_BLOCKS: List[Tuple[str, str, int, int]] = [
    # (torch name, flax name, in_channels, out_channels)
    ("encoder.encoder1_2", "ResidualBlock_0", 64, 128),
    ("encoder.encoder2_1", "ResidualBlock_1", 128, 128),
    ("encoder.encoder2_2", "ResidualBlock_2", 128, 256),
    ("encoder.encoder2_3", "ResidualBlock_3", 256, 256),
    ("encoder.encoder3_1", "ResidualBlock_4", 256, 256),
    ("encoder.encoder3_2", "ResidualBlock_5", 256, 512),
    ("encoder.encoder3_3", "ResidualBlock_6", 512, 512),
    ("encoder.encoder4_1", "ResidualBlock_7", 512, 512),
    ("encoder.encoder4_2", "ResidualBlock_8", 512, 1024),
    ("encoder.encoder4_3", "ResidualBlock_9", 1024, 1024),
]

_VOTE_BLOCKS = [
    ("vote_encoder.encoder6_1", "ResidualBlock_0", 256, 256),
    ("vote_encoder.encoder6_2", "ResidualBlock_1", 256, 512),
    ("vote_encoder.encoder6_3", "ResidualBlock_2", 512, 512),
]


def _linear(sd, prefix):
    out = {"kernel": np.asarray(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _norm(sd, prefix):
    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _kpconv(sd, prefix):
    out = {"weights": np.asarray(sd[prefix + ".weights"])}
    if prefix + ".bias" in sd:
        out["bias"] = np.asarray(sd[prefix + ".bias"])
    return out


def _unary(sd, prefix):
    return {
        "Dense_0": _linear(sd, prefix + ".mlp"),
        "MaskedGroupNorm_0": _norm(sd, prefix + ".norm.norm"),
    }


def _residual_block(sd, prefix, c_in, c_out):
    """ResidualBlock: unary1 always present (in != out//4 for every block in
    this architecture); shortcut unary only when in != out."""
    out = {
        "UnaryBlock_0": _unary(sd, prefix + ".unary1"),
        "KPConv_0": _kpconv(sd, prefix + ".KPConv"),
        "MaskedGroupNorm_0": _norm(sd, prefix + ".norm_conv.norm"),
        "UnaryBlock_1": _unary(sd, prefix + ".unary2"),
    }
    if c_in != c_out:
        out["UnaryBlock_2"] = _unary(sd, prefix + ".unary_shortcut")
    return out


def _attention_core(sd, prefix):
    """proj_q/k/v + output linear + post-norm of one attention layer."""
    return {
        "Dense_0": _linear(sd, prefix + ".attention.proj_q"),
        "Dense_1": _linear(sd, prefix + ".attention.proj_k"),
        "Dense_2": _linear(sd, prefix + ".attention.proj_v"),
        "Dense_3": _linear(sd, prefix + ".linear"),
        "LayerNorm_0": _norm(sd, prefix + ".norm"),
    }


def _attention_output(sd, prefix):
    return {
        "Dense_0": _linear(sd, prefix + ".expand"),
        "Dense_1": _linear(sd, prefix + ".squeeze"),
        "LayerNorm_0": _norm(sd, prefix + ".norm"),
    }


def convert_state_dict(sd: Dict[str, np.ndarray], num_layers: int = 4) -> Dict:
    """Convert a reference LCRNet state_dict into this framework's
    {'params': ...} tree (all leaves numpy)."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    p: Dict = {}

    # --- encoder
    enc = {
        "ConvBlock_0": {
            "KPConv_0": _kpconv(sd, "encoder.encoder1_1.KPConv"),
            "MaskedGroupNorm_0": _norm(sd, "encoder.encoder1_1.norm.norm"),
        }
    }
    for tname, fname, ci, co in _ENCODER_BLOCKS:
        enc[fname] = _residual_block(sd, tname, ci, co)
    p["encoder"] = enc

    # --- transformer
    tr: Dict = {
        "LinearPosEmbedding_0": {
            "Dense_0": _linear(sd, "transformer.embedding.encoder"),
            "Dense_1": _linear(sd, "transformer.embedding.encoder2"),
        },
        "Dense_0": _linear(sd, "transformer.in_proj"),
        "Dense_1": _linear(sd, "transformer.out_proj"),
    }
    for layer in range(num_layers):
        self_i, cross_i = 2 * layer, 2 * layer + 1
        tr[f"RPEAttentionLayer_{layer}"] = _attention_core(
            sd, f"transformer.transformer.layers.{self_i}.attention"
        )
        tr[f"AttentionOutput_{2 * layer}"] = _attention_output(
            sd, f"transformer.transformer.layers.{self_i}.output"
        )
        tr[f"CrossAttentionLayer_{layer}"] = _attention_core(
            sd, f"transformer.transformer.layers.{cross_i}.attention"
        )
        tr[f"AttentionOutput_{2 * layer + 1}"] = _attention_output(
            sd, f"transformer.transformer.layers.{cross_i}.output"
        )
    p["transformer"] = tr

    # --- vote encoder (MLP Sequential indices 0,1,3,4 + ctr_reg + stage-5)
    ve: Dict = {
        "VoteLayer_0": {
            "Dense_0": _linear(sd, "vote_encoder.vote.mlp_modules.0"),
            "LayerNorm_0": _norm(sd, "vote_encoder.vote.mlp_modules.1"),
            "Dense_1": _linear(sd, "vote_encoder.vote.mlp_modules.3"),
            "LayerNorm_1": _norm(sd, "vote_encoder.vote.mlp_modules.4"),
            "Dense_2": _linear(sd, "vote_encoder.vote.ctr_reg"),
        }
    }
    for tname, fname, ci, co in _VOTE_BLOCKS:
        ve[fname] = _residual_block(sd, tname, ci, co)
    p["vote_encoder"] = ve

    # --- heads
    p["node_score_head"] = _linear(sd, "proj_node_overlap_score")
    p["kpdecoder"] = {
        "UnaryBlock_0": _unary(sd, "kpdecoder.decoder3"),
        "UnaryBlock_1": _unary(sd, "kpdecoder.decoder2"),
        "LastUnaryBlock_0": {"Dense_0": _linear(sd, "kpdecoder.decoder1.mlp")},
    }
    if "netvlad.cluster_weights" in sd:
        p["netvlad"] = {
            "cluster_weights": np.asarray(sd["netvlad.cluster_weights"]),
            "cluster_weights2": np.asarray(sd["netvlad.cluster_weights2"]),
            "hidden1_weights": np.asarray(sd["netvlad.hidden1_weights"]),
            "LayerNorm_0": _norm(sd, "netvlad.bn1"),
            "LayerNorm_1": _norm(sd, "netvlad.bn2"),
            "GatingContext_0": {
                "gating_weights": np.asarray(sd["netvlad.context_gating.gating_weights"]),
                "LayerNorm_0": _norm(sd, "netvlad.context_gating.bn1"),
            },
        }
    p["node_ot_alpha"] = np.asarray(sd["node_optimal_transport.alpha"])
    p["point_ot_alpha"] = np.asarray(sd["optimal_transport.alpha"])
    return {"params": p}


# ---------------------------------------------------------------------------
# Reverse direction: flax param tree -> reference torch state_dict.
#
# Exact inverse of convert_state_dict: every key that the forward map
# consumes is emitted (Linear kernels transposed back to (out, in), norm
# `scale` back to `weight`, KPConv weights unchanged), so a tree trained in
# this framework can be loaded into the reference's own torch LCRNet
# (`model_family/LCRNet.py:25-339`, strict=False leaves only non-parameter
# buffers to the torch init) — the cross-implementation pose-parity path.
# ---------------------------------------------------------------------------


def _inv_linear(sd, prefix, node):
    sd[prefix + ".weight"] = np.asarray(node["kernel"]).T
    if "bias" in node:
        sd[prefix + ".bias"] = np.asarray(node["bias"])


def _inv_norm(sd, prefix, node):
    sd[prefix + ".weight"] = np.asarray(node["scale"])
    sd[prefix + ".bias"] = np.asarray(node["bias"])


def _inv_kpconv(sd, prefix, node):
    sd[prefix + ".weights"] = np.asarray(node["weights"])
    if "bias" in node:
        sd[prefix + ".bias"] = np.asarray(node["bias"])


def _inv_unary(sd, prefix, node):
    _inv_linear(sd, prefix + ".mlp", node["Dense_0"])
    _inv_norm(sd, prefix + ".norm.norm", node["MaskedGroupNorm_0"])


def _inv_residual(sd, prefix, node):
    _inv_unary(sd, prefix + ".unary1", node["UnaryBlock_0"])
    _inv_kpconv(sd, prefix + ".KPConv", node["KPConv_0"])
    _inv_norm(sd, prefix + ".norm_conv.norm", node["MaskedGroupNorm_0"])
    _inv_unary(sd, prefix + ".unary2", node["UnaryBlock_1"])
    if "UnaryBlock_2" in node:
        _inv_unary(sd, prefix + ".unary_shortcut", node["UnaryBlock_2"])


def _inv_attention_core(sd, prefix, node):
    _inv_linear(sd, prefix + ".attention.proj_q", node["Dense_0"])
    _inv_linear(sd, prefix + ".attention.proj_k", node["Dense_1"])
    _inv_linear(sd, prefix + ".attention.proj_v", node["Dense_2"])
    _inv_linear(sd, prefix + ".linear", node["Dense_3"])
    _inv_norm(sd, prefix + ".norm", node["LayerNorm_0"])


def _inv_attention_output(sd, prefix, node):
    _inv_linear(sd, prefix + ".expand", node["Dense_0"])
    _inv_linear(sd, prefix + ".squeeze", node["Dense_1"])
    _inv_norm(sd, prefix + ".norm", node["LayerNorm_0"])


def convert_params_to_state_dict(params: Dict, num_layers: int = 4) -> Dict[str, np.ndarray]:
    """Convert this framework's {'params': ...} tree back into a reference
    torch state_dict (numpy leaves; wrap with torch.from_numpy to load)."""
    p = params.get("params", params)
    sd: Dict[str, np.ndarray] = {}

    enc = p["encoder"]
    _inv_kpconv(sd, "encoder.encoder1_1.KPConv", enc["ConvBlock_0"]["KPConv_0"])
    _inv_norm(sd, "encoder.encoder1_1.norm.norm", enc["ConvBlock_0"]["MaskedGroupNorm_0"])
    for tname, fname, _ci, _co in _ENCODER_BLOCKS:
        _inv_residual(sd, tname, enc[fname])

    tr = p["transformer"]
    _inv_linear(sd, "transformer.embedding.encoder", tr["LinearPosEmbedding_0"]["Dense_0"])
    _inv_linear(sd, "transformer.embedding.encoder2", tr["LinearPosEmbedding_0"]["Dense_1"])
    _inv_linear(sd, "transformer.in_proj", tr["Dense_0"])
    _inv_linear(sd, "transformer.out_proj", tr["Dense_1"])
    for layer in range(num_layers):
        self_i, cross_i = 2 * layer, 2 * layer + 1
        _inv_attention_core(
            sd, f"transformer.transformer.layers.{self_i}.attention",
            tr[f"RPEAttentionLayer_{layer}"])
        _inv_attention_output(
            sd, f"transformer.transformer.layers.{self_i}.output",
            tr[f"AttentionOutput_{2 * layer}"])
        _inv_attention_core(
            sd, f"transformer.transformer.layers.{cross_i}.attention",
            tr[f"CrossAttentionLayer_{layer}"])
        _inv_attention_output(
            sd, f"transformer.transformer.layers.{cross_i}.output",
            tr[f"AttentionOutput_{2 * layer + 1}"])

    ve = p["vote_encoder"]
    vl = ve["VoteLayer_0"]
    _inv_linear(sd, "vote_encoder.vote.mlp_modules.0", vl["Dense_0"])
    _inv_norm(sd, "vote_encoder.vote.mlp_modules.1", vl["LayerNorm_0"])
    _inv_linear(sd, "vote_encoder.vote.mlp_modules.3", vl["Dense_1"])
    _inv_norm(sd, "vote_encoder.vote.mlp_modules.4", vl["LayerNorm_1"])
    _inv_linear(sd, "vote_encoder.vote.ctr_reg", vl["Dense_2"])
    for tname, fname, _ci, _co in _VOTE_BLOCKS:
        _inv_residual(sd, tname, ve[fname])

    _inv_linear(sd, "proj_node_overlap_score", p["node_score_head"])
    _inv_unary(sd, "kpdecoder.decoder3", p["kpdecoder"]["UnaryBlock_0"])
    _inv_unary(sd, "kpdecoder.decoder2", p["kpdecoder"]["UnaryBlock_1"])
    _inv_linear(sd, "kpdecoder.decoder1.mlp", p["kpdecoder"]["LastUnaryBlock_0"]["Dense_0"])

    if "netvlad" in p:
        nv = p["netvlad"]
        sd["netvlad.cluster_weights"] = np.asarray(nv["cluster_weights"])
        sd["netvlad.cluster_weights2"] = np.asarray(nv["cluster_weights2"])
        sd["netvlad.hidden1_weights"] = np.asarray(nv["hidden1_weights"])
        _inv_norm(sd, "netvlad.bn1", nv["LayerNorm_0"])
        _inv_norm(sd, "netvlad.bn2", nv["LayerNorm_1"])
        sd["netvlad.context_gating.gating_weights"] = np.asarray(
            nv["GatingContext_0"]["gating_weights"])
        _inv_norm(sd, "netvlad.context_gating.bn1", nv["GatingContext_0"]["LayerNorm_0"])

    sd["node_optimal_transport.alpha"] = np.asarray(p["node_ot_alpha"])
    sd["optimal_transport.alpha"] = np.asarray(p["point_ot_alpha"])
    return sd


def load_torch_snapshot(path: str) -> Dict[str, np.ndarray]:
    """Load a reference `.tar` snapshot's model state_dict as numpy."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    sd = payload.get("model", payload)
    return {k.replace("module.", ""): v.numpy() for k, v in sd.items()}

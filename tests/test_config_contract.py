"""Radius/threshold contract: repo config defaults == reference config values.

The model carries five easily cross-wired distance constants (GT-matching
0.45, fine-loss positive radius 0.45, fine-matching/LGR acceptance 0.45,
eval acceptance 0.6, GT-corres 2.4, NMS 2.4).  A refactor that swaps any two
of them would silently corrupt training targets or eval verdicts, so this
test pins every numeric default against the reference's config singletons
(`/root/reference/experiments/lcrnet/config_model.py:31-122`,
`config_reg.py:62-67`) — parsed from the files when the reference tree is
present, plus literal pins that hold even without it.
"""

import os.path as osp
import re

import pytest

from lcrnet_tpu.config import (
    BackboneConfig,
    CoarseMatchingConfig,
    EvalConfig,
    FineMatchingConfig,
    LossConfig,
    ModelConfig,
    VoteConfig,
)

REF_DIR = "/root/reference/experiments/lcrnet"


def _parse_ref_config(path):
    """Read `_C.section.key = <number>` assignments (commented lines skipped)."""
    values = {}
    pat = re.compile(
        r"^_C\.([A-Za-z_]+)\.([A-Za-z_0-9]+)\s*=\s*([-+0-9.eE]+)\s*(?:#.*)?$"
    )
    with open(path) as f:
        for line in f:
            m = pat.match(line.strip())
            if m:
                values[(m.group(1), m.group(2))] = float(m.group(3))
    return values


# (section, key) in the reference  ->  (repo config instance, attr)
_MODEL_CONTRACT = [
    # backbone geometry: radii in voxel units scale every neighbor search
    ("backbone", "num_stages", BackboneConfig(), "num_stages"),
    ("backbone", "init_voxel_size", BackboneConfig(), "init_voxel_size"),
    ("backbone", "kernel_size", BackboneConfig(), "kernel_size"),
    ("backbone", "base_radius", BackboneConfig(), "base_radius"),
    ("backbone", "base_sigma", BackboneConfig(), "base_sigma"),
    ("backbone", "group_norm", BackboneConfig(), "group_norm"),
    ("backbone", "init_dim", BackboneConfig(), "init_dim"),
    ("backbone", "output_dim", BackboneConfig(), "output_dim"),
    # the five cross-wire-prone distance constants
    ("model", "ground_truth_matching_radius", ModelConfig(),
     "ground_truth_matching_radius"),
    ("model", "ground_truth_corres_radius", ModelConfig(),
     "ground_truth_corres_radius"),
    ("fine_matching", "acceptance_radius", FineMatchingConfig(),
     "acceptance_radius"),
    ("fine_loss", "positive_radius", LossConfig(), "fine_positive_radius"),
    ("Vote", "NMS_radius", VoteConfig(), "nms_radius"),
    # remaining numerics with repo twins
    ("model", "num_points_in_patch", ModelConfig(), "num_points_in_patch"),
    ("model", "num_sinkhorn_iterations", ModelConfig(),
     "num_sinkhorn_iterations"),
    ("model", "n2p_score_threshold", ModelConfig(), "n2p_score_threshold"),
    ("model", "p2p_score_threshold", ModelConfig(), "p2p_score_threshold"),
    ("coarse_matching", "num_targets", CoarseMatchingConfig(), "num_targets"),
    ("coarse_matching", "overlap_threshold", CoarseMatchingConfig(),
     "overlap_threshold"),
    ("Vote", "MAX_TRANSLATE_RANGE", VoteConfig(), "max_translate_range"),
    ("fine_matching", "topk", FineMatchingConfig(), "topk"),
    ("fine_matching", "confidence_threshold", FineMatchingConfig(),
     "confidence_threshold"),
    ("fine_matching", "correspondence_threshold", FineMatchingConfig(),
     "correspondence_threshold"),
    ("fine_matching", "num_refinement_steps", FineMatchingConfig(),
     "num_refinement_steps"),
    ("coarse_loss", "positive_overlap", LossConfig(), "positive_overlap"),
    ("distribution_loss", "triplet_loss_gamma", LossConfig(), "gap_gamma"),
    ("triplet_loss", "margin", LossConfig(), "triplet_margin"),
    ("loss", "weight_coarse_loss", LossConfig(), "weight_coarse_loss"),
    ("loss", "weight_vote_loss", LossConfig(), "weight_vote_loss"),
    ("loss", "weight_gap_loss", LossConfig(), "weight_gap_loss"),
]

_REG_CONTRACT = [
    ("eval", "acceptance_overlap", EvalConfig(), "acceptance_overlap"),
    ("eval", "acceptance_radius", EvalConfig(), "acceptance_radius"),
    ("eval", "inlier_ratio_threshold", EvalConfig(), "inlier_ratio_threshold"),
    ("eval", "rre_threshold", EvalConfig(), "rre_threshold"),
    ("eval", "rte_threshold", EvalConfig(), "rte_threshold"),
]


@pytest.mark.skipif(not osp.isdir(REF_DIR), reason="reference tree absent")
@pytest.mark.parametrize(
    "fname,contract",
    [("config_model.py", _MODEL_CONTRACT), ("config_reg.py", _REG_CONTRACT)],
    ids=["model", "reg"],
)
def test_defaults_match_reference_config(fname, contract):
    ref = _parse_ref_config(osp.join(REF_DIR, fname))
    for section, key, cfg, attr in contract:
        assert (section, key) in ref, f"reference dropped _C.{section}.{key}"
        got = float(getattr(cfg, attr))
        want = ref[(section, key)]
        assert got == pytest.approx(want), (
            f"{type(cfg).__name__}.{attr}={got} != "
            f"reference _C.{section}.{key}={want}"
        )


def test_radius_constants_literal_pins():
    """The cross-wire-prone constants, pinned literally (reference values as
    of `config_model.py:46-93` + `config_reg.py:62-67`), so the guard holds
    on hosts without /root/reference."""
    assert ModelConfig().ground_truth_matching_radius == 0.45
    assert LossConfig().fine_positive_radius == 0.45
    assert FineMatchingConfig().acceptance_radius == 0.45
    assert EvalConfig().acceptance_radius == 0.6
    assert ModelConfig().ground_truth_corres_radius == 2.4
    assert VoteConfig().nms_radius == 2.4
    # derived radii: stage-0 neighbor radius and KPConv sigma in meters
    assert BackboneConfig().init_radius == pytest.approx(4.25 * 0.3)
    assert BackboneConfig().init_sigma == pytest.approx(2.0 * 0.3)

"""The per-pair registration npz artifact schema.

One definition shared by every producer (`experiments/test_registration.py`,
`experiments/accuracy_benchmark.py`) so the dumps stay consumable by
`experiments/eval_registration.py`.  Parity target: the npz dumped by the
reference's `experiments/registration/test_registration.py:68-91`.
"""

from __future__ import annotations

from typing import Dict


def registration_dump_arrays(out: Dict) -> Dict:
    """Select the artifact arrays from a single-pair LCRNet output dict.

    Works under jit (pure slicing).  The GT transform is appended host-side
    by the caller as `keep["transform"]`.
    """
    return {
        "ref_points_f": out["points_f"][0],
        "src_points_f": out["points_f"][1],
        "ref_masks_f": out["masks_f"][0],
        "src_masks_f": out["masks_f"][1],
        "ref_nodes": out["nodes"][0],
        "src_nodes": out["nodes"][1],
        "node_masks": out["node_masks"],
        "ref_node_corr_indices": out["ref_node_corr_indices"],
        "src_node_corr_indices": out["src_node_corr_indices"],
        "node_corr_valid": out["node_corr_valid"],
        "ref_corr_points": out["ref_corr_points"],
        "src_corr_points": out["src_corr_points"],
        "corr_scores": out["corr_scores"],
        "corr_valid": out["corr_valid"],
        "estimated_transform": out["estimated_transform"],
        "gt_node_corr_ref": out["gt_node_corr"].ref_indices,
        "gt_node_corr_src": out["gt_node_corr"].src_indices,
        "gt_node_corr_overlaps": out["gt_node_corr"].overlaps,
        "gt_node_corr_valid": out["gt_node_corr"].valid,
    }
